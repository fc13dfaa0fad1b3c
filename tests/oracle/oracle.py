"""NumPy oracle: a direct, loop-level transcription of the reference
semantics (/root/reference/main.c), used as the independent ground truth
for testing the vectorised JAX framework.

Deliberately written with explicit Python loops wherever the C code is
loop-carried (preconditioner sweeps, marker DDA, source emission) so the
mapping from the C source is obvious and auditable; vectorised numpy is
used only where iteration order cannot matter.  float32 for grid fields,
float64 for the CG solve, exactly like the reference (main.c:64-67,
577-578).  Slow — keep test horizons short.
"""

from __future__ import annotations

import numpy as np

FLT_MAX = np.float32(np.finfo(np.float32).max)


def _f32(x):
    return np.float32(x)


class XorShift64Star:
    def __init__(self, seed=0x9BD185C449534B91):
        self.state = np.uint64(seed)

    def next32(self):
        x = self.state
        with np.errstate(over="ignore"):
            x ^= x >> np.uint64(12)
            x = x ^ ((x << np.uint64(25)) & np.uint64(0xFFFFFFFFFFFFFFFF))
            x ^= x >> np.uint64(27)
            self.state = x
            return np.uint32(
                ((x * np.uint64(0x2545F4914F6CDD1D)) & np.uint64(0xFFFFFFFFFFFFFFFF))
                >> np.uint64(32)
            )

    def randf(self):
        return np.float32(np.float64(self.next32()) / 4294967295.0)


def hsv_basis(t):
    t = _f32(t)
    t = _f32(t - _f32(6.0) * np.floor(_f32(1.0 / 6.0) * t))
    if t < 0.0:
        t = _f32(t + 6.0)
    if t < 1.0:
        return t
    elif t < 3.0:
        return _f32(1.0)
    elif t < 4.0:
        return _f32(4.0 - t)
    else:
        return _f32(0.0)


class Oracle:
    """Mirror of the reference's global state and sim functions."""

    def __init__(self, scenario_text, X=100, Y=40, rainbow=False,
                 max_iterations=100, tol=1e-6):
        self.X, self.Y = X, Y
        self.UX, self.UY = X - 1, Y
        self.VX, self.VY = X, Y - 1
        self.h = _f32(1.0)
        self.density = _f32(1.0)
        self.gravity = _f32(-10.0)
        self.rainbow = rainbow
        self.max_iterations = max_iterations
        self.tol = tol

        self.u = np.zeros((Y, X), np.float32)
        self.v = np.zeros((Y, X), np.float32)
        self.r = np.zeros((Y, X), np.float32)
        self.g = np.zeros((Y, X), np.float32)
        self.b = np.zeros((Y, X), np.float32)
        self.solid = np.zeros((Y, X), bool)
        self.source = np.zeros((Y, X), bool)
        self.sink = np.zeros((Y, X), bool)
        self.marker_count = np.zeros((Y, X), np.int32)
        self.prev_marker_count = np.zeros((Y, X), np.int32)
        self.markers = []  # list of [x, y] float32 pairs, compacted
        self.max_markers = 4 * Y * X
        self.source_exhausted = False
        self.frame_count = 0
        self.rng = XorShift64Star()

        self._init_from_text(scenario_text)

    # -- init (main.c:209-274) --
    def _init_from_text(self, text):
        X, Y = self.X, self.Y
        data = text.encode() if isinstance(text, str) else text
        fluid = np.zeros((Y, X), bool)
        i, length = 0, len(data)
        y = Y - 2
        while y > 0 and i < length:
            x = 1
            while x < X - 1 and i < length:
                c = chr(data[i]); i += 1
                if c == "\n":
                    break
                elif c == "X":
                    self.solid[y, x] = True
                elif c == "0":
                    fluid[y, x] = True
                elif c == "?":
                    fluid[y, x] = True
                    self.source[y, x] = True
                elif c == "=":
                    self.sink[y, x] = True
                x += 1
            if x == X - 1:
                while i < length and chr(data[i]) != "\n":
                    i += 1
                if i < length:
                    i += 1
            y -= 1

        self.sink[:, 0] = True
        self.sink[:, X - 1] = True
        self.sink[0, :] = True
        self.sink[Y - 1, :] = True

        for i in range(X):
            for j in range(Y):
                if fluid[j, i]:
                    for k in range(4):
                        x = _f32(i + (0.0 if k < 2 else 0.5) + self.rng.randf() / _f32(2.0))
                        y = _f32(j + (0.0 if k % 2 else 0.5) + self.rng.randf() / _f32(2.0))
                        self.markers.append([_f32(self.h * x), _f32(self.h * y)])
        self.refresh_marker_counts()
        if self.rainbow:
            self.colorize()

    # -- markers (main.c:102-117) --
    def refresh_marker_counts(self):
        self.prev_marker_count = self.marker_count.copy()
        self.marker_count = np.zeros_like(self.marker_count)
        i = 0
        while i < len(self.markers):
            x = int(np.floor(self.markers[i][0] / self.h))
            y = int(np.floor(self.markers[i][1] / self.h))
            assert 0 < x < self.X and 0 < y < self.Y
            if self.sink[y, x] or self.solid[y, x]:
                self.markers[i] = self.markers[-1]
                self.markers.pop()
            else:
                self.marker_count[y, x] += 1
                i += 1

    @property
    def fluid(self):
        return self.marker_count > 0

    @property
    def prev_fluid(self):
        return self.prev_marker_count > 0

    # -- cell-type properties (main.c:119-147) --
    def prop(self, mask, x, y, ctype):
        if ctype == "p":
            return bool(mask[y, x])
        if ctype == "u":
            return bool(mask[y, x] or mask[y, x + 1])
        if ctype == "v":
            return bool(mask[y, x] or mask[y + 1, x])
        raise ValueError(ctype)

    def grid_size(self, ctype):
        return {
            "p": (self.X, self.Y),
            "u": (self.UX, self.UY),
            "v": (self.VX, self.VY),
        }[ctype]

    # -- extrapolation (main.c:158-185) --
    def extrapolate(self, q, ctype):
        sx, sy = self.grid_size(ctype)
        prev, cur = self.prev_fluid, self.fluid
        out = q  # in-place like the reference (no hazard, see main.c:173)
        for y in range(sy):
            for x in range(sx):
                if (not self.prop(prev, x, y, ctype)) and self.prop(cur, x, y, ctype):
                    total, count = _f32(0.0), 0
                    for ny in range(max(y - 1, 0), min(y + 1, sy - 1) + 1):
                        for nx in range(max(x - 1, 0), min(x + 1, sx - 1) + 1):
                            if self.prop(prev, nx, ny, ctype):
                                total = _f32(total + q[ny, nx])
                                count += 1
                    out[y, x] = _f32(total / count) if count else _f32(0.0)
        return out

    def colorize(self):
        for y in range(self.Y):
            for x in range(self.X):
                if self.fluid[y, x]:
                    t = _f32(0.0)
                    if not self.source[y, x]:
                        t = _f32((x + y) * _f32(6.0) / _f32(60.0))
                    self.r[y, x] = hsv_basis(t + _f32(2.0))
                    self.g[y, x] = hsv_basis(t)
                    self.b[y, x] = hsv_basis(t - _f32(2.0))

    # -- sources (main.c:276-298) --
    def update_fluid_sources(self):
        self.source_exhausted |= len(self.markers) == self.max_markers - 1
        t = _f32(_f32(0.6) / _f32(10.0) * self.frame_count)
        for y in range(self.Y):
            for x in range(self.X):
                if self.source[y, x]:
                    if not self.source_exhausted and self.marker_count[y, x] < 4:
                        # main.c:288 calls randf() twice inside one
                        # expression (unspecified order); the gcc-built
                        # binary evaluates RIGHT-to-left, so the y jitter
                        # consumes the first draw.  Verified against the
                        # compiled reference (tests/test_ref_binary.py).
                        jy = self.rng.randf()
                        jx = self.rng.randf()
                        mx = _f32(self.h * _f32(x + jx))
                        my = _f32(self.h * _f32(y + jy))
                        self.markers.append([mx, my])
                        self.marker_count[y, x] += 1
                        self.source_exhausted |= len(self.markers) == self.max_markers - 1
                    self.r[y, x] = hsv_basis(t + _f32(2.0))
                    self.g[y, x] = hsv_basis(t)
                    self.b[y, x] = hsv_basis(t - _f32(2.0))

    # -- interpolation (main.c:301-376) --
    def interpolate(self, q, ix, iy, ctype):
        sx, sy = self.grid_size(ctype)
        ix = min(max(_f32(ix), _f32(0.0)), np.nextafter(_f32(sx - 1), _f32(0.0)))
        iy = min(max(_f32(iy), _f32(0.0)), np.nextafter(_f32(sy - 1), _f32(0.0)))
        bx, by = int(ix), int(iy)
        fx, fy = _f32(ix - bx), _f32(iy - by)
        fl = self.fluid

        valid = [[self.prop(fl, bx, by, ctype), self.prop(fl, bx + 1, by, ctype)],
                 [self.prop(fl, bx, by + 1, ctype), self.prop(fl, bx + 1, by + 1, ctype)]]
        qq = [[q[by, bx] if valid[0][0] else _f32(0.0),
               q[by, bx + 1] if valid[0][1] else _f32(0.0)],
              [q[by + 1, bx] if valid[1][0] else _f32(0.0),
               q[by + 1, bx + 1] if valid[1][1] else _f32(0.0)]]

        def get_fraction(frac, sv, ev):
            if not sv:
                return _f32(1.0)
            if not ev:
                return _f32(0.0)
            return frac

        def linear(x0, x1, frac):
            return _f32((_f32(1.0) - frac) * x0 + frac * x1)

        lf = get_fraction(fy, valid[0][0], valid[1][0])
        rf = get_fraction(fy, valid[0][1], valid[1][1])
        lv = linear(qq[0][0], qq[1][0], lf)
        rv = linear(qq[0][1], qq[1][1], rf)
        hf = get_fraction(fx, valid[0][0] or valid[1][0], valid[0][1] or valid[1][1])
        return linear(lv, rv, hf)

    # -- grid advection (main.c:382-438) --
    def advect_u(self, u, v, dt, out):
        for y in range(self.UY):
            for x in range(self.UX):
                if self.prop(self.fluid, x, y, "u"):
                    dx = u[y, x]
                    dy = self.interpolate(v, _f32(x + 0.5), _f32(y - 0.5), "v")
                    px = _f32(x - dx * dt / self.h)
                    py = _f32(y - dy * dt / self.h)
                    out[y, x] = self.interpolate(u, px, py, "u")

    def advect_v(self, u, v, dt, out):
        for y in range(self.VY):
            for x in range(self.VX):
                if self.prop(self.fluid, x, y, "v"):
                    dy = v[y, x]
                    dx = self.interpolate(u, _f32(x - 0.5), _f32(y + 0.5), "u")
                    px = _f32(x - dx * dt / self.h)
                    py = _f32(y - dy * dt / self.h)
                    out[y, x] = self.interpolate(v, px, py, "v")

    def advect_p(self, q, u, v, dt, out):
        for y in range(self.Y):
            for x in range(self.X):
                if self.fluid[y, x]:
                    dy = _f32((v[y, x] + v[y - 1, x]) / 2)
                    dx = _f32((u[y, x] + u[y, x - 1]) / 2)
                    px = _f32(x - dx * dt / self.h)
                    py = _f32(y - dy * dt / self.h)
                    out[y, x] = self.interpolate(q, px, py, "p")

    # -- marker advection (main.c:440-537) --
    def velocity_at(self, px, py):
        ux = _f32(px / self.h - 1.0)
        uy = _f32(py / self.h - 0.5)
        vx = _f32(px / self.h - 0.5)
        vy = _f32(py / self.h - 1.0)
        return (self.interpolate(self.u, ux, uy, "u"),
                self.interpolate(self.v, vx, vy, "v"))

    @staticmethod
    def time_to(p0, p1, v):
        if abs(v) > 0.0:
            return _f32((p1 - p0) / v)
        return FLT_MAX

    def advect_markers(self, dt):
        # NB: dt_i is NOT reset between markers.  The reference mutates
        # its dt PARAMETER on collisions (`dt -= t_prev`, main.c:501/513)
        # and the loop over markers (main.c:465) reuses the mutated
        # value, so once any marker hits a solid after a boundary
        # crossing (t_prev > 0), every subsequent marker in the same
        # call advects for less time.  Root-caused 2026-08-17: with
        # dt reset per marker the oracle diverges from a strict-IEEE
        # (-fno-fast-math -ffp-contract=off) build of the reference at
        # filter frame 29; with the carry it is bitwise identical
        # through 30+ frames (the old test_ref_binary docstring blamed
        # fast-math codegen for that horizon — wrong).
        dt_i = _f32(dt)
        for i in range(len(self.markers)):
            px, py = self.markers[i]
            vx, vy = self.velocity_at(px, py)

            x_idx = int(np.floor(px / self.h))
            y_idx = int(np.floor(py / self.h))

            x_dir = 1 if vx > 0 else -1
            nx_idx = x_idx + (1 if vx > 0 else 0)
            npx = _f32(nx_idx * self.h)
            t_x = self.time_to(px, npx, vx)
            x_off = -1 if vx < 0 else 0

            y_dir = 1 if vy > 0 else -1
            ny_idx = y_idx + (1 if vy > 0 else 0)
            npy = _f32(ny_idx * self.h)
            t_y = self.time_to(py, npy, vy)
            y_off = -1 if vy < 0 else 0

            t_prev = _f32(0.0)
            t_near = min(t_x, t_y)
            while t_near < dt_i:
                if t_x < t_y:
                    if self.solid[y_idx, nx_idx + x_off]:
                        px = _f32(px + t_prev * vx)
                        py = _f32(py + t_prev * vy)
                        dt_i = _f32(dt_i - t_prev)
                        t_near = _f32(0.0)
                        vx = _f32(0.0)
                        t_x = FLT_MAX
                        t_y = self.time_to(py, npy, vy)
                    else:
                        x_idx = nx_idx
                        nx_idx = x_idx + x_dir
                        npx = _f32(nx_idx * self.h)
                        t_x = self.time_to(px, npx, vx)
                else:
                    if self.solid[ny_idx + y_off, x_idx]:
                        px = _f32(px + t_prev * vx)
                        py = _f32(py + t_prev * vy)
                        dt_i = _f32(dt_i - t_prev)
                        t_near = _f32(0.0)
                        vy = _f32(0.0)
                        t_y = FLT_MAX
                        t_x = self.time_to(px, npx, vx)
                    else:
                        y_idx = ny_idx
                        ny_idx = y_idx + y_dir
                        npy = _f32(ny_idx * self.h)
                        t_y = self.time_to(py, npy, vy)
                t_prev = t_near
                t_near = min(t_x, t_y)
            t = dt_i if t_near < FLT_MAX else t_prev
            self.markers[i] = [_f32(px + t * vx), _f32(py + t * vy)]

    # -- forces / bounds / cfl (main.c:539-545, 808-841) --
    def apply_body_forces(self, v, dt):
        v[: self.VY, : self.VX] += _f32(self.gravity * dt)

    def zero_bounds(self, q, ctype):
        sx, sy = self.grid_size(ctype)
        for y in range(sy):
            for x in range(sx):
                if (not self.prop(self.fluid, x, y, ctype)) or self.prop(
                    self.solid, x, y, ctype
                ):
                    q[y, x] = 0.0

    def calculate_timestep(self, frame_time):
        max_distance = _f32(0.75) * self.h
        mu = np.max(np.square(self.u[: self.UY, : self.UX])) if self.UY else 0.0
        mv = np.max(np.square(self.v[: self.VY, : self.VX])) if self.VY else 0.0
        max_velocity = _f32(np.sqrt(_f32(mu + mv)))
        if max_velocity > 0:
            return _f32(min(_f32(max_distance / max_velocity), _f32(frame_time)))
        return _f32(frame_time)

    # -- projection (main.c:547-806) --
    def _fluid_cells(self):
        ys, xs = np.nonzero(self.fluid)
        return list(zip(ys.tolist(), xs.tolist()))

    def a_diag(self):
        a = np.zeros((self.Y, self.X), np.int8)
        for y, x in self._fluid_cells():
            a[y, x] = 4 - (
                int(self.solid[y, x - 1]) + int(self.solid[y, x + 1])
                + int(self.solid[y - 1, x]) + int(self.solid[y + 1, x])
            )
        return a

    def apply_preconditioner(self, a, r):
        # Note a reference quirk replicated here: get_a_minus_i(y,x)
        # (main.c:569-571) expands to is_fluid(y,x), which is always true
        # inside these fluid-guarded loops, so the E_inv terms read
        # g_precon at the left/below neighbour REGARDLESS of its fluidity
        # — including stale values from earlier solves, since g_precon is
        # a never-cleared global (main.c:577).  self.precon persists
        # across calls to model that.  It only shapes preconditioner
        # quality, never the converged solution.
        fl = self.fluid
        Y, X = self.Y, self.X
        precon = self.precon
        for y in range(Y):
            for x in range(X):
                if fl[y, x]:
                    av = float(a[y, x])
                    bb = (-1.0) * precon[y, x - 1]
                    cc = (-1.0) * precon[y - 1, x]
                    e = av - bb * bb - cc * cc
                    if e < 0.25 * av:
                        e = av if av != 0 else 1.0
                    precon[y, x] = 1.0 / np.sqrt(e)
        q = np.zeros((Y, X), np.float64)
        for y in range(Y):
            for x in range(X):
                if fl[y, x]:
                    # get_a_plus_i(y,x-1) / get_a_plus_j(y-1,x) are again
                    # is_fluid(y,x) == -1 here (main.c:607-609); the q
                    # factors are zero at non-fluid cells so only the
                    # precon staleness above can differ from a "clean" IC.
                    t = (r[y, x]
                         + precon[y, x - 1] * q[y, x - 1]
                         + precon[y - 1, x] * q[y - 1, x])
                    q[y, x] = t * precon[y, x]
        z = np.zeros((Y, X), np.float64)
        for y in range(Y - 1, -1, -1):
            for x in range(X - 1, -1, -1):
                if fl[y, x]:
                    api = -1.0 if fl[y, x + 1] else 0.0
                    apj = -1.0 if fl[y + 1, x] else 0.0
                    t = (q[y, x]
                         - api * precon[y, x] * z[y, x + 1]
                         - apj * precon[y, x] * z[y + 1, x])
                    z[y, x] = t * precon[y, x]
        return z

    @property
    def precon(self):
        if not hasattr(self, "_precon"):
            self._precon = np.zeros((self.Y, self.X), np.float64)
        return self._precon

    def apply_a(self, a, s):
        out = np.zeros_like(s)
        fl = self.fluid
        for y, x in self._fluid_cells():
            out[y, x] = (
                float(a[y, x]) * s[y, x]
                - (s[y, x + 1] if fl[y, x + 1] else 0.0)
                - (s[y + 1, x] if fl[y + 1, x] else 0.0)
                - (s[y, x - 1] if fl[y, x - 1] else 0.0)
                - (s[y - 1, x] if fl[y - 1, x] else 0.0)
            )
        return out

    def project(self, dt, u, v, uout, vout):
        Y, X = self.Y, self.X
        fl = self.fluid
        k_inv_scale = np.float64(_f32(_f32(self.h * self.h) * self.density / _f32(dt)))

        b = np.zeros((Y, X), np.float64)
        for y, x in self._fluid_cells():
            div = _f32((u[y, x] - u[y, x - 1] + v[y, x] - v[y - 1, x]) / self.h)
            b[y, x] = -np.float64(div) * k_inv_scale

        a = self.a_diag()
        fluid_list = self._fluid_cells()

        p = np.zeros((Y, X), np.float64)
        r = b.copy()
        if any(r[y, x] != 0.0 for y, x in fluid_list):
            z = self.apply_preconditioner(a, r)
            s = z.copy()

            def dot(aa, bb):
                tot = 0.0
                for y, x in fluid_list:
                    tot += aa[y, x] * bb[y, x]
                return tot

            def inf_norm(rr):
                m = 0.0
                for y, x in fluid_list:
                    m = max(m, abs(rr[y, x]))
                return m

            sigma = dot(z, r)
            for _ in range(self.max_iterations):
                z = self.apply_a(a, s)
                alpha = sigma / dot(z, s)
                for y, x in fluid_list:
                    p[y, x] += alpha * s[y, x]
                    r[y, x] -= alpha * z[y, x]
                if inf_norm(r) <= self.tol:
                    break
                z = self.apply_preconditioner(a, r)
                sigma_new = dot(z, r)
                beta = sigma_new / sigma
                for y, x in fluid_list:
                    s[y, x] = z[y, x] + beta * s[y, x]
                sigma = sigma_new

        for y, x in fluid_list:
            if p[y, x] < 0.0:
                p[y, x] = 0.0

        inv_rho_h = _f32(1.0 / (self.density * self.h))
        for y in range(self.UY):
            for x in range(self.UX):
                if self.prop(self.solid, x, y, "u"):
                    uout[y, x] = 0.0
                elif self.prop(fl, x, y, "u"):
                    dp = _f32(p[y, x + 1] - p[y, x])
                    uout[y, x] = _f32(u[y, x] + _f32(-inv_rho_h * dp) * _f32(dt))
                else:
                    uout[y, x] = 0.0
        for y in range(self.VY):
            for x in range(self.VX):
                if self.prop(self.solid, x, y, "v"):
                    vout[y, x] = 0.0
                elif self.prop(fl, x, y, "v"):
                    dp = _f32(p[y + 1, x] - p[y, x])
                    vout[y, x] = _f32(v[y, x] + _f32(-inv_rho_h * dp) * _f32(dt))
                else:
                    vout[y, x] = 0.0
        self.last_pressure = p

    # -- one frame (main.c:843-900) --
    def sim_step(self):
        frame_time = _f32(0.1)
        step = 0
        while frame_time > 0.0 and step < 8:
            dt = self.calculate_timestep(frame_time)
            frame_time = _f32(frame_time - dt)

            self.advect_markers(dt)
            self.refresh_marker_counts()

            if self.rainbow:
                self.extrapolate(self.r, "p")
                self.extrapolate(self.g, "p")
                self.extrapolate(self.b, "p")
            self.update_fluid_sources()
            self.extrapolate(self.u, "u")
            self.extrapolate(self.v, "v")
            self.zero_bounds(self.u, "u")
            self.zero_bounds(self.v, "v")

            utmp = self.u.copy()
            vtmp = self.v.copy()
            self.advect_u(self.u, self.v, dt, utmp)
            self.advect_v(self.u, self.v, dt, vtmp)
            if self.rainbow:
                rt = self.r.copy()
                self.advect_p(self.r, self.u, self.v, dt, rt)
                self.r = rt
                gt = self.g.copy()
                self.advect_p(self.g, self.u, self.v, dt, gt)
                self.g = gt
                bt = self.b.copy()
                self.advect_p(self.b, self.u, self.v, dt, bt)
                self.b = bt

            self.apply_body_forces(vtmp, dt)
            self.zero_bounds(utmp, "u")
            self.zero_bounds(vtmp, "v")

            self.project(dt, utmp, vtmp, self.u, self.v)
            step += 1
        self.frame_count += 1

    def markers_array(self):
        return np.array(self.markers, np.float32).reshape(-1, 2)
