"""Capture golden frames from the REAL compiled reference binary.

Builds /root/reference with CMake (out of tree), drives the `euler`
binary in a pty sized larger than the grid (so nothing is clipped,
main.c:917-920), and decodes the ANSI stream back into per-cell glyph
grids (and 24-bit colors in --rainbow mode).  This retires the
"oracle transcribed by the port author" single point of failure: the
committed corpus under tests/goldens/ref_binary/ is produced by the
actual gcc-compiled C program, and both the oracle and the framework
must match it (tests/test_ref_binary.py).

Frame format (main.c:953-959): each draw() is one write() of
  \\x1b[H  <rows, sep \\r\\n, each ending \\x1b[0m\\x1b[K>  \\x1b[?25l
Rows are y = Y-2 .. 1 top-down, cols x = 1 .. X-2 (main.c:914-951).
The binary paces at 10 FPS (main.c:1036) and is fully deterministic
(fixed RNG seed main.c:204, fixed 0.1 s frame time main.c:849).

Usage:  python tests/oracle/capture_ref.py [--frames N] [--out DIR]
"""

import argparse
import fcntl
import os
import re
import select
import struct
import subprocess
import sys
import termios
import time

import numpy as np

REF_DIR = "/root/reference"
_CSI = re.compile(rb"\x1b\[([0-9;?]*)([A-Za-z])")

SCENARIOS = ["basic.txt", "block.txt", "filter.txt", "waterfall.txt",
             "weird-edges.txt"]


def build_reference(build_dir="/tmp/refbuild"):
    """CMake-build the reference out of tree; returns the binary path."""
    binary = os.path.join(build_dir, "euler")
    if not os.path.exists(binary):
        subprocess.run(
            ["cmake", "-S", REF_DIR, "-B", build_dir,
             "-DCMAKE_BUILD_TYPE=Release"],
            check=True, capture_output=True)
        subprocess.run(["cmake", "--build", build_dir],
                       check=True, capture_output=True)
    return binary


def _read_frames(binary, scenario, n_frames, rainbow, rows=60, cols=130,
                 timeout_s=120.0):
    """Run the binary in a pty and return the first n_frames+1 raw frame
    blobs (frame 0 is the initial state, frame k is after k sim steps)."""
    pid, fd = os.forkpty()
    if pid == 0:  # child
        os.environ["TERM"] = "xterm-256color"
        args = [binary]
        if rainbow:
            args.append("--rainbow")
        args.append(scenario)
        os.execv(binary, args)
    # parent: size the pty window larger than the grid so draw_rows does
    # not clip (needs g_wx >= X-2, g_wy >= Y-2; main.c:917-920)
    fcntl.ioctl(fd, termios.TIOCSWINSZ, struct.pack("HHHH", rows, cols, 0, 0))
    buf = b""
    deadline = time.time() + timeout_s
    sent_q = False
    try:
        while time.time() < deadline:
            r, _, _ = select.select([fd], [], [], 0.25)
            if r:
                try:
                    chunk = os.read(fd, 65536)
                except OSError:
                    break  # child exited
                if not chunk:
                    break
                buf += chunk
            if not sent_q and buf.count(b"\x1b[?25l") > n_frames:
                os.write(fd, b"q")
                sent_q = True
        os.close(fd)
    finally:
        try:
            os.kill(pid, 9)
        except ProcessLookupError:
            pass
        os.waitpid(pid, 0)
    blobs = buf.split(b"\x1b[?25l")[: n_frames + 1]
    if len(blobs) < n_frames + 1:
        raise RuntimeError(
            f"{scenario}: captured {len(blobs)} frames, wanted {n_frames + 1}")
    # keep only the content after the frame's cursor-home
    return [b[b.rfind(b"\x1b[H") + 3:] for b in blobs]


def decode_frame(blob):
    """ANSI blob -> (glyphs [R,C] uint8, colors [R,C,3] int16, -1 = none).

    A tiny SGR interpreter: tracks the current foreground across the
    escape codes the reference emits (T_BLUE, T_RESET, 38;2;r;g;b) and
    records it per printed cell.
    """
    rows_g, rows_c = [], []
    for line in blob.split(b"\r\n"):
        glyphs, colors = [], []
        fg = (-1, -1, -1)
        pos = 0
        for m in _CSI.finditer(line):
            for ch in line[pos:m.start()]:
                glyphs.append(ch)
                colors.append(fg)
            params, final = m.group(1), m.group(2)
            if final == b"m":
                p = params.split(b";")
                if p[0] in (b"", b"0"):
                    fg = (-1, -1, -1)
                elif p[0] == b"34":
                    fg = (-2, -2, -2)  # sentinel: ANSI blue (T_BLUE)
                elif p[0] == b"38" and len(p) >= 5 and p[1] == b"2":
                    fg = (int(p[2]), int(p[3]), int(p[4]))
            pos = m.end()
        for ch in line[pos:]:
            glyphs.append(ch)
            colors.append(fg)
        if glyphs:
            rows_g.append(glyphs)
            rows_c.append(colors)
    width = max(len(r) for r in rows_g)
    g = np.full((len(rows_g), width), ord(" "), np.uint8)
    c = np.full((len(rows_g), width, 3), -1, np.int16)
    for i, (rg, rc) in enumerate(zip(rows_g, rows_c)):
        g[i, : len(rg)] = rg
        c[i, : len(rc)] = rc
    return g, c


def capture(binary, scenario, n_frames, rainbow=False):
    """Returns (glyphs [F+1,R,C] u8, colors [F+1,R,C,3] i16, raw blobs)."""
    blobs = _read_frames(binary, scenario, n_frames, rainbow)
    decoded = [decode_frame(b) for b in blobs]
    shapes = {d[0].shape for d in decoded}
    assert len(shapes) == 1, f"inconsistent frame shapes: {shapes}"
    return (np.stack([d[0] for d in decoded]),
            np.stack([d[1] for d in decoded]), blobs)


def pack_blobs(blobs):
    """Raw frame blobs -> (bytes array, offsets) for npz storage."""
    cat = b"".join(blobs)
    offsets = np.cumsum([0] + [len(b) for b in blobs])
    return np.frombuffer(cat, np.uint8), offsets.astype(np.int64)


def unpack_blobs(raw, offsets):
    data = raw.tobytes()
    return [data[offsets[i]: offsets[i + 1]] for i in range(len(offsets) - 1)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--rainbow-frames", type=int, default=25)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    out_dir = args.out or os.path.join(repo, "tests", "goldens", "ref_binary")
    os.makedirs(out_dir, exist_ok=True)
    binary = build_reference()

    for name in SCENARIOS:
        scn = os.path.join(repo, "scenarios", name)
        stem = name.replace(".txt", "")
        g, c, blobs = capture(binary, scn, args.frames, rainbow=False)
        raw, off = pack_blobs(blobs)
        np.savez_compressed(os.path.join(out_dir, stem + ".npz"),
                            glyphs=g, raw=raw, raw_offsets=off)
        gr, cr, blobs_r = capture(binary, scn, args.rainbow_frames,
                                  rainbow=True)
        raw_r, off_r = pack_blobs(blobs_r)
        np.savez_compressed(os.path.join(out_dir, stem + "_rainbow.npz"),
                            glyphs=gr, colors=cr,
                            raw=raw_r, raw_offsets=off_r)
        water = (g[-1] != ord(" ")).sum()
        print(f"{stem}: mono {g.shape} rainbow {gr.shape} "
              f"(frame {args.frames}: {water} non-space cells)", flush=True)


if __name__ == "__main__":
    main()
