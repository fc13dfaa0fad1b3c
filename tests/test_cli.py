"""End-to-end interactive CLI test through a pseudo-terminal.

Drives `python -m euler_tpu` the way a user would (raw-mode keys,
ANSI frame stream) and checks the rendered output and clean exit on 'q'
(main.c:961-980 key handling, 953-959 frame writes).
"""

import os
import pty
import select
import subprocess
import sys
import time

import pytest


def _drain(fd, timeout=0.3, max_wall=2.0):
    out = b""
    end = time.time() + max_wall
    while time.time() < end:
        r, _, _ = select.select([fd], [], [], timeout)
        if not r:
            break
        try:
            chunk = os.read(fd, 65536)
        except OSError:
            break
        if not chunk:
            break
        out += chunk
    return out


def test_interactive_cli_renders_and_quits():
    master, slave = pty.openpty()
    # give the pty a real window size (fresh ptys report 0x0)
    import fcntl
    import struct
    import termios as _t

    fcntl.ioctl(slave, _t.TIOCSWINSZ, struct.pack("HHHH", 30, 110, 0, 0))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd()
    proc = subprocess.Popen(
        [sys.executable, "-m", "euler_tpu", "scenarios/basic.txt",
         "--cpu", "--fps", "30"],
        stdin=slave,
        stdout=slave,
        stderr=subprocess.PIPE,
        env=env,
        cwd=os.getcwd(),
    )
    os.close(slave)
    try:
        # wait for the first frames (includes jit compile)
        out = b""
        deadline = time.time() + 180
        while time.time() < deadline:
            out += _drain(master, timeout=1.0)
            # \x1b[?25l (hide cursor) is emitted only by real frames
            # (main.c:957), not by the initial screen clears
            if out.count(b"\x1b[?25l") >= 2:
                break
        assert out.count(b"\x1b[?25l") >= 2, "no frame repaint seen"
        assert b"\x1b[34m" in out, "no blue water run seen"
        assert b"o" in out or b"O" in out or b"0" in out, "no water glyphs"

        os.write(master, b"p")  # pause
        _drain(master, max_wall=0.5)
        os.write(master, b"f")  # single-step while paused
        _drain(master, max_wall=0.5)
        os.write(master, b"q")  # quit
        # keep draining so the child never blocks on a full pty buffer
        deadline = time.time() + 30
        while proc.poll() is None and time.time() < deadline:
            _drain(master, timeout=0.2, max_wall=0.5)
        assert proc.returncode == 0
    finally:
        if proc.poll() is None:
            proc.kill()
        os.close(master)
