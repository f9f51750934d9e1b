"""Baked fast preview: render rgb/depth/semantics without field queries.

The interactive GUI asks for preview frames every few seconds; a full
volumetric render at 720p costs seconds (per-sample hash-grid gathers).
This module trades that for a two-phase design shaped for TPU:

  bake():   evaluate the trained field once on a dense voxel grid
            (chunked; seconds), keep the surface cells (alpha above
            threshold), and store them as a fixed-size splat cloud with
            per-point rgb + class id + cell size.
  render(): project the splats with one (N, 3) x (3, 3) matmul, resolve
            visibility with a scatter-min z-buffer, and fill holes with
            a few dense 3x3 min-pool passes — no gathers proportional
            to rays x samples, so a 720p frame costs milliseconds.

This is the TPU-native answer to the reference's preview latency (the
GUI re-renders every 5 s at factor-4 resolution, scripts/gui.py:20,
175-182) and the concrete step toward the 30 fps 720p north star
(BASELINE.json): benchmarks/preview_fps.py measures it on hardware.
"""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e9


@dataclasses.dataclass
class BakedScene:
    """Fixed-size splat cloud: positions (K, 3), rgb (K, 3), class ids
    (K,), per-splat radius (world units), validity mask (K,).

    `sh` optionally holds degree-1 spherical-harmonic color coefficients
    (K, 3, 3): d rgb / d view-direction-component. With it, the renderer
    evaluates rgb + sh @ view per splat (view = unit vector camera ->
    splat), recovering the field's view dependence instead of freezing a
    canonical downward view."""
    points: jnp.ndarray
    rgb: jnp.ndarray
    semantic: jnp.ndarray
    valid: jnp.ndarray
    cell_size: float
    sh: jnp.ndarray = None

    @property
    def n_valid(self):
        return int(np.asarray(self.valid.sum()))


_SH_DIRS = np.array([[1, 0, 0], [-1, 0, 0],
                     [0, 1, 0], [0, -1, 0],
                     [0, 0, 1], [0, 0, -1]], np.float32)


def _make_shade_fn(field, view_dependent):
    """Returns jitted shade(params, x) -> (dc_rgb, lin_or_None, class).

    view_dependent fits a degree-1 SH per splat from 6 axis-aligned view
    probes of the color head (closed-form least squares on +/- axis
    pairs): dc = mean(colors), lin[a] = (c(+a) - c(-a)) / 2."""

    def shade(p, x):
        _, geo = field.density(p, x)
        logits, _ = field.semantic(p, geo)
        sem = jnp.argmax(logits, axis=-1)
        if not view_dependent:
            view = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), x.shape)
            return field.color(p, view, geo), None, sem
        colors = jnp.stack([
            field.color(p, jnp.broadcast_to(d, x.shape), geo)
            for d in jnp.asarray(_SH_DIRS)])  # (6, n, 3)
        dc = colors.mean(axis=0)
        lin = jnp.stack([(colors[2 * a] - colors[2 * a + 1]) * 0.5
                         for a in range(3)], axis=1)  # (n, 3axis, 3rgb)
        return dc, lin, sem

    return jax.jit(shade)


def bake(field, params, resolution=192, max_points=2 ** 19,
         alpha_threshold=None, chunk=65536, view_dependent=True):
    """Evaluate the field on a resolution^3 grid and keep surface cells.

    With view_dependent (default), each splat stores a degree-1 SH color
    (DC + linear-in-view terms) fitted from 6 axis view probes, so the
    preview tracks the field's view dependence; without it, splats store
    the color under a canonical downward view. Returns a BakedScene with
    exactly max_points rows (top-alpha cells, zero-padded), so
    downstream rendering jits once.
    """
    bound = field.config.bound
    r = resolution
    cell = 2.0 * bound / r
    centers_1d = np.linspace(-bound + cell / 2, bound - cell / 2, r,
                             dtype=np.float32)
    grid = np.stack(np.meshgrid(centers_1d, centers_1d, centers_1d,
                                indexing='ij'), axis=-1).reshape(-1, 3)

    density_fn = jax.jit(lambda p, x: field.density(p, x)[0])
    sigmas = np.empty(grid.shape[0], np.float32)
    for start in range(0, grid.shape[0], chunk):
        sl = slice(start, start + chunk)
        sigmas[sl] = np.asarray(density_fn(params, jnp.asarray(grid[sl])))

    alpha = 1.0 - np.exp(-sigmas * cell)
    if alpha_threshold is None:
        # Adaptive: half the near-max opacity, floored — well-trained
        # fields have near-1 surface alphas; weakly-trained ones (tests,
        # early previews) still yield their densest shell.
        alpha_threshold = max(0.5 * np.percentile(alpha, 99.9), 0.01)
    candidates = np.flatnonzero(alpha > alpha_threshold)
    if candidates.size > max_points:
        order = np.argsort(alpha[candidates])[::-1]
        candidates = candidates[order[:max_points]]
    n = candidates.size

    points = grid[candidates]

    shade = _make_shade_fn(field, view_dependent)
    rgb = np.zeros((max_points, 3), np.float32)
    sh = np.zeros((max_points, 3, 3), np.float32) if view_dependent else None
    semantic = np.zeros(max_points, np.int32)
    out_points = np.zeros((max_points, 3), np.float32)
    out_points[:n] = points
    for start in range(0, n, chunk):
        sl = slice(start, min(start + chunk, n))
        c, lin, s = shade(params, jnp.asarray(points[sl]))
        rgb[sl] = np.asarray(c)
        if view_dependent:
            sh[sl] = np.asarray(lin)
        semantic[sl] = np.asarray(s)

    valid = np.zeros(max_points, bool)
    valid[:n] = True
    return BakedScene(points=jnp.asarray(out_points),
                      rgb=jnp.asarray(rgb),
                      semantic=jnp.asarray(semantic),
                      valid=jnp.asarray(valid),
                      cell_size=cell,
                      sh=None if sh is None else jnp.asarray(sh))


@functools.partial(jax.jit, static_argnames=('height', 'width',
                                             'fill_passes', 'cell_size'))
def _splat_render(points, rgb, sh, semantic, valid, intrinsics, T_CW,
                  height, width, fill_passes=2, cell_size=0.0):
    """Project splats, z-buffer them, footprint-propagate. All dense ops."""
    rot = T_CW[:3, :3]
    t = T_CW[:3, 3]
    cam = points @ rot.T + t  # (K, 3), OpenCV convention (+z forward)
    z = cam[:, 2]
    in_front = (z > 0.05) & valid

    if sh is not None:
        # Per-splat view direction (camera center -> splat, the ray
        # direction convention of core/rays.py) through the degree-1 SH:
        # rgb + view . lin, clipped to the renderer's output range.
        center = -rot.T @ t
        view = points - center
        view = view / jnp.maximum(
            jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-8)
        rgb = jnp.clip(rgb + (view[:, :, None] * sh).sum(axis=1), 0.0, 1.0)

    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    u = fx * cam[:, 0] / z + cx
    v = fy * cam[:, 1] / z + cy
    px = jnp.round(u).astype(jnp.int32)
    py = jnp.round(v).astype(jnp.int32)
    in_image = (px >= 0) & (px < width) & (py >= 0) & (py < height)
    ok = in_front & in_image

    n_pixels = height * width
    pid = jnp.where(ok, py * width + px, n_pixels)  # dump slot at the end

    zbuf = jnp.full(n_pixels + 1, _BIG).at[pid].min(jnp.where(ok, z, _BIG))
    # Winners: points that own their pixel's nearest depth (ties both
    # write; acceptable for preview).
    win = ok & (z <= zbuf[pid] * (1.0 + 1e-4))
    winf = win.astype(jnp.float32)[:, None]

    img = jnp.zeros((n_pixels + 1, 3)).at[pid].add(rgb * winf)
    cnt = jnp.zeros(n_pixels + 1).at[pid].add(winf[:, 0])
    sem = jnp.zeros(n_pixels + 1, jnp.int32).at[pid].max(
        jnp.where(win, semantic + 1, 0))

    image = (img[:n_pixels] / jnp.maximum(cnt[:n_pixels, None], 1.0)
             ).reshape(height, width, 3)
    depth = zbuf[:n_pixels].reshape(height, width)
    classes = sem[:n_pixels].reshape(height, width)  # 0 = hole
    hit = cnt[:n_pixels].reshape(height, width) > 0
    splat_hit = hit  # pre-fill coverage (diagnostics: hole-filled px)

    # Footprint propagation (dense image-space splatting). A splat is a
    # CELL of physical size, but the z-buffer above lands it on a single
    # pixel; at 720p a wall 3 m away has splat centers ~5 px apart, so
    # most pixels either show a surface BEHIND the nearest one (the ray
    # "pierces" between splat centers — the round-3/4 fidelity runs'
    # 0.76 m depth MAE) or are holes. Each pass expands every splat one
    # pixel ring, gated by its TRUE projected radius cell*f/(2z): a
    # pixel adopts the nearest qualifying neighbor when it is empty, or
    # when that neighbor's surface is distinctly in front of what the
    # pixel currently shows (margin = cell quantization + 5% of depth).
    # Information travels one ring per pass, so a splat reaches ring k
    # only while rad_px >= k — footprint-exact dilation; holes beyond
    # every footprint accept up to 2x the radius (grazing-angle gaps in
    # enclosed scenes) and otherwise stay background.
    focal = 0.5 * (fx + fy)
    cell = jnp.float32(cell_size)

    def fill(state, pass_idx):
        image, depth, classes, hit = state
        ring = pass_idx.astype(jnp.float32) + 1.0
        margin = jnp.maximum(3.0 * cell, 0.05 * depth)
        # Replaceable depth: holes accept anything nearer than BIG;
        # covered pixels only a distinctly-nearer surface.
        beat = jnp.where(hit, depth - margin, _BIG)
        best_d = jnp.full_like(depth, _BIG)
        best_i = image
        best_c = classes
        took = jnp.zeros_like(hit)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                nd = jnp.roll(depth, (dy, dx), axis=(0, 1))
                ni = jnp.roll(image, (dy, dx), axis=(0, 1))
                nc = jnp.roll(classes, (dy, dx), axis=(0, 1))
                nh = jnp.roll(hit, (dy, dx), axis=(0, 1))
                rad_px = cell * focal / (2.0 * jnp.maximum(nd, 1e-6))
                # + 0.5: the splat center sits anywhere within its
                # landing pixel, so its footprint extends up to
                # rad + 0.5 px from that pixel's center — without this
                # a factor-4 wall (rad ~0.8 px, centers ~1.6 px apart)
                # could never reclaim the pixels its rays pierce.
                reach = jnp.where(hit, rad_px, 2.0 * rad_px) + 0.5 >= ring
                take = nh & reach & (nd < jnp.minimum(beat, best_d))
                best_d = jnp.where(take, nd, best_d)
                best_i = jnp.where(take[..., None], ni, best_i)
                best_c = jnp.where(take, nc, best_c)
                took = took | take
        return (best_i, jnp.where(took, best_d, depth), best_c,
                hit | took), None

    (image, depth, classes, hit), _ = jax.lax.scan(
        fill, (image, depth, classes, hit), jnp.arange(fill_passes))

    image = jnp.where(hit[..., None], image, 1.0)  # bg_color parity
    depth = jnp.where(hit, depth, 0.0)
    classes = jnp.where(hit, jnp.maximum(classes - 1, 0), 0)
    return image, depth, classes, splat_hit


@jax.jit
def _slab_write(buf, upd, start):
    """Write `upd` into device buffer `buf` at row `start` (traced, so
    one compile per buffer dtype/rank covers every block index)."""
    idx = (start,) + (jnp.int32(0),) * (buf.ndim - 1)
    return jax.lax.dynamic_update_slice(buf, upd, idx)


class IncrementalBaker:
    """Amortized re-bake: update one slab of the volume at a time.

    A full bake() sweeps resolution^3 density queries — seconds of
    stall when run inside the interactive message pump (the round-2
    preview's periodic cliff). This splits the volume into `n_blocks`
    slabs along x, each owning max_points // n_blocks splat rows
    (top-alpha WITHIN the slab instead of globally — indistinguishable
    at preview budgets), so one update_next_block() call costs
    ~1/n_blocks of a full bake and the interactive loop interleaves
    slab refreshes between train steps without ever freezing.

    Reference cadence being replaced: full re-render every 5 s
    (scripts/gui.py:20,175-182); round-2 behavior being replaced:
    synchronous full re-bake every rebake_every steps (backend.py).
    """

    def __init__(self, field, resolution=128, max_points=2 ** 18,
                 n_blocks=16, chunk=65536, view_dependent=True):
        assert resolution % n_blocks == 0
        self.field = field
        self.resolution = resolution
        self.n_blocks = n_blocks
        self.chunk = chunk
        self.view_dependent = view_dependent
        self.points_per_block = max_points // n_blocks
        self.max_points = self.points_per_block * n_blocks

        bound = field.config.bound
        r = resolution
        self.cell = 2.0 * bound / r
        centers = np.linspace(-bound + self.cell / 2, bound - self.cell / 2,
                              r, dtype=np.float32)
        self._centers = centers
        self._rows_per_block = r // n_blocks

        self._points = np.zeros((self.max_points, 3), np.float32)
        self._rgb = np.zeros((self.max_points, 3), np.float32)
        self._sh = (np.zeros((self.max_points, 3, 3), np.float32)
                    if view_dependent else None)
        self._semantic = np.zeros(self.max_points, np.int32)
        self._valid = np.zeros(self.max_points, bool)
        self._next_block = 0
        # Alpha scale for thresholding must be GLOBAL: a mostly-empty
        # slab's own 99.9th alpha percentile is tiny, and thresholding
        # relative to it admits low-alpha fog that z-buffers IN FRONT of
        # real surfaces baked from other slabs. Track a decaying max of
        # per-slab percentiles (decay lets the scale follow a field whose
        # densities shrink as training sharpens). The decay target is
        # 0.9x per FULL ROTATION; per-block updates apply the n_blocks-th
        # root so the scale never sags below ~0.9x of the dense slab's
        # percentile regardless of where in the rotation a slab sits.
        self._alpha_scale = 0.0
        self._block_decay = 0.9 ** (1.0 / n_blocks)
        self._density_fn = jax.jit(lambda p, x: field.density(p, x)[0])
        self._shade_fn = _make_shade_fn(field, view_dependent)
        # Device-resident splat cache: scene() must NOT re-upload the
        # full cache per preview (2^18 splats with SH is ~17 MB; over a
        # tunneled TPU that async upload lands on whatever runs next —
        # measured r4: train steps collapsed 205 -> 2.5 steps/s while
        # serving baked previews). Built on first scene(); update_block
        # then re-uploads only its own slab.
        self._dev = None

    def _slab_alpha(self, params, block):
        """Density-sweep slab `block`: (grid points (M, 3), alpha (M,))."""
        rows = slice(block * self._rows_per_block,
                     (block + 1) * self._rows_per_block)
        grid = np.stack(np.meshgrid(self._centers[rows], self._centers,
                                    self._centers, indexing='ij'),
                        axis=-1).reshape(-1, 3)
        sigmas = np.empty(grid.shape[0], np.float32)
        for start in range(0, grid.shape[0], self.chunk):
            sl = slice(start, start + self.chunk)
            sigmas[sl] = np.asarray(
                self._density_fn(params, jnp.asarray(grid[sl])))
        return grid, 1.0 - np.exp(-sigmas * self.cell)

    def update_block(self, params, block, _precomputed=None):
        """Re-evaluate slab `block` and refresh its splat rows."""
        if _precomputed is None:
            grid, alpha = self._slab_alpha(params, block)
            self._alpha_scale = max(float(np.percentile(alpha, 99.9)),
                                    self._block_decay * self._alpha_scale)
        else:
            grid, alpha = _precomputed
        threshold = max(0.5 * self._alpha_scale, 0.01)
        candidates = np.flatnonzero(alpha > threshold)
        if candidates.size > self.points_per_block:
            order = np.argsort(alpha[candidates])[::-1]
            candidates = candidates[order[:self.points_per_block]]
        n = candidates.size

        out = slice(block * self.points_per_block,
                    block * self.points_per_block + self.points_per_block)
        self._points[out] = 0.0
        self._valid[out] = False
        if n:
            pts = grid[candidates]
            self._points[out.start:out.start + n] = pts
            for start in range(0, n, self.chunk):
                sl = slice(start, min(start + self.chunk, n))
                c, lin, s = self._shade_fn(params, jnp.asarray(pts[sl]))
                dst = slice(out.start + sl.start, out.start + sl.stop)
                self._rgb[dst] = np.asarray(c)
                if self._sh is not None:
                    self._sh[dst] = np.asarray(lin)
                self._semantic[dst] = np.asarray(s)
            self._valid[out.start:out.start + n] = True
        self._commit_block(block)

    def _commit_block(self, block):
        """Upload one refreshed slab into the device-side cache."""
        if self._dev is None:
            return
        out = slice(block * self.points_per_block,
                    (block + 1) * self.points_per_block)
        start = jnp.int32(out.start)
        for key, host in (('points', self._points), ('rgb', self._rgb),
                          ('semantic', self._semantic),
                          ('valid', self._valid), ('sh', self._sh)):
            if host is None:
                continue
            self._dev[key] = _slab_write(self._dev[key],
                                         jnp.asarray(host[out]), start)

    def update_next_block(self, params):
        """Refresh the next slab in rotation; returns the block index."""
        block = self._next_block
        if self._alpha_scale == 0.0:
            # Cold start: with no global alpha statistics yet, the first
            # rotation would threshold each slab against only the slabs
            # seen so far — transiently readmitting the low-alpha fog the
            # global scale exists to exclude. One density-only sweep sets
            # the scale before any slab commits splats; the current
            # slab's sweep is reused for its own update.
            precomputed = None
            for b in range(self.n_blocks):
                pre = self._slab_alpha(params, b)
                self._alpha_scale = max(self._alpha_scale,
                                        float(np.percentile(pre[1], 99.9)))
                if b == block:
                    precomputed = pre
            self.update_block(params, block, _precomputed=precomputed)
        else:
            self.update_block(params, block)
        self._next_block = (block + 1) % self.n_blocks
        return block

    def update_all(self, params):
        """Full refresh: sweep every slab's densities FIRST so the alpha
        threshold is set by global statistics (matching bake()), then
        select + shade each slab against it."""
        slabs = [self._slab_alpha(params, b) for b in range(self.n_blocks)]
        self._alpha_scale = max(
            max(float(np.percentile(a, 99.9)) for _, a in slabs),
            0.9 * self._alpha_scale)
        for block, pre in enumerate(slabs):
            self.update_block(params, block, _precomputed=pre)

    def scene(self):
        if self._dev is None:
            self._dev = {
                'points': jnp.asarray(self._points),
                'rgb': jnp.asarray(self._rgb),
                'semantic': jnp.asarray(self._semantic),
                'valid': jnp.asarray(self._valid),
                'sh': None if self._sh is None else jnp.asarray(self._sh),
            }
        return BakedScene(points=self._dev['points'],
                          rgb=self._dev['rgb'],
                          semantic=self._dev['semantic'],
                          valid=self._dev['valid'],
                          cell_size=self.cell,
                          sh=self._dev['sh'])


class GovernedPreviewRenderer:
    """BakedRenderer with an fps governor: adapts the splat budget to
    hold a target frame rate.

    The >=30 fps 720p preview north star (BASELINE.json) is otherwise
    weather-dependent — the fixed 2^18 budget measured 42.8 fps one day
    and 24.9 the next under tunnel variance (BASELINE.md r2/r3). The
    governor measures THROUGHPUT and steps between pre-sliced budget
    LEVELS: level k renders every 2^k-th splat (stride subsampling
    keeps spatial coverage; hole-filling gets one extra pass per
    halving). Levels jit once each per frame size; switching costs
    nothing afterwards.

    Two measured lessons shape the control law:
      * Frames must NOT be synced individually — over a tunneled device
        a per-frame block_until_ready serializes round trips and every
        level looks equally slow (measured r4: full budget 39 fps
        pipelined, yet per-frame sync drove the governor to the
        smallest budget for a 30 fps result). The governor syncs every
        `sync_every` frames and attributes the batch time evenly, so it
        sees pipelined throughput like a navigating GUI does.
      * A down-step must EARN its fidelity cost: after settling at the
        lower level, if the measured frame time did not improve by
        `min_gain` over the level above (the latency floor is elsewhere
        — RTT, dispatch), the governor reverts and locks the down-move
        out for `lockout` sync batches.

    Step up only when the time beats target * headroom (default 0.45 <
    0.5, so the ~2x cost of the richer level still fits — no flapping).
    Compile batches (first use of a level at a size) are excluded.
    """

    def __init__(self, baked: BakedScene, target_fps=30.0, n_levels=3,
                 ema=0.4, headroom=0.45, sync_every=8, min_gain=0.15,
                 lockout=8, time_fn=None):
        self.target_fps = target_fps
        self.headroom = headroom
        self.sync_every = sync_every
        self.min_gain = min_gain
        self.lockout = lockout
        self._ema_w = ema
        self._time = time_fn if time_fn is not None else _perf_counter
        self.n_levels = n_levels
        self.level = 0
        self._ema_s = None
        self._level_time = {}     # settled per-frame time by level
        self._down_locked = 0     # sync batches until down-steps allowed
        self._probing_down = False
        self._batches_at_level = 0
        self._rendered = set()
        self._pending = 0
        self._batch_start = None
        self._last_out = None
        self.set_scene(baked)

    def set_scene(self, baked: BakedScene):
        """Swap in a fresh bake (slicing is metadata-only on device)."""
        self._levels = []
        for k in range(self.n_levels):
            stride = 1 << k
            self._levels.append(BakedScene(
                points=baked.points[::stride],
                rgb=baked.rgb[::stride],
                semantic=baked.semantic[::stride],
                valid=baked.valid[::stride],
                cell_size=baked.cell_size * stride,
                sh=None if baked.sh is None else baked.sh[::stride]))

    def _renderer(self):
        return BakedRenderer(self._levels[self.level],
                             fill_passes=2 + self.level)

    def warmup(self, intrinsics, size):
        """Compile every level for this frame size up front (off the
        interactive path; each level is one XLA program)."""
        for level in range(self.n_levels):
            BakedRenderer(self._levels[level],
                          fill_passes=2 + level).render(
                              intrinsics, np.eye(4), size)
            self._rendered.add((level, tuple(size)))

    def render(self, intrinsics, T_CW, size):
        key = (self.level, tuple(size))
        first = key not in self._rendered
        if self._batch_start is None:
            self._batch_start = self._time()
        out = self._renderer().render(intrinsics, T_CW, size)
        self._rendered.add(key)
        self._pending += 1
        self._last_out = out
        if self._pending >= self.sync_every or first:
            out['depth'].block_until_ready()
            elapsed = self._time() - self._batch_start
            per_frame = elapsed / self._pending
            self._pending = 0
            self._batch_start = None
            if not first:
                self._record(per_frame)
        out['splat_level'] = self.level
        return out

    def flush(self):
        """Sync any in-flight frames (call before idling so the next
        batch's timing does not absorb queued work)."""
        if self._pending and self._last_out is not None:
            self._last_out['depth'].block_until_ready()
            elapsed = self._time() - self._batch_start
            self._record(elapsed / self._pending)
        self._pending = 0
        self._batch_start = None

    def _record(self, per_frame):
        self._ema_s = (per_frame if self._ema_s is None else
                       self._ema_w * per_frame
                       + (1 - self._ema_w) * self._ema_s)
        self._batches_at_level += 1
        if self._batches_at_level >= 2:
            self._govern()

    def _switch(self, level, probing_down=False):
        self._level_time[self.level] = self._ema_s
        self.level = level
        self._ema_s = None
        self._batches_at_level = 0
        self._probing_down = probing_down

    def _govern(self):
        budget = 1.0 / self.target_fps
        if self._down_locked > 0:
            self._down_locked -= 1
        if self._probing_down:
            # Did dropping splats actually buy time? If not, the floor
            # is elsewhere (RTT, dispatch): revert, lock out.
            above = self._level_time.get(self.level - 1)
            if above is not None and                     self._ema_s > (1.0 - self.min_gain) * above:
                self._down_locked = self.lockout
                self._switch(self.level - 1)
                return
            self._probing_down = False
        if (self._ema_s > budget and self.level < self.n_levels - 1
                and self._down_locked == 0):
            self._switch(self.level + 1, probing_down=True)
        elif (self._ema_s < budget * self.headroom and self.level > 0):
            self._switch(self.level - 1)

    @property
    def fps_estimate(self):
        return None if not self._ema_s else 1.0 / self._ema_s


def _perf_counter():
    import time
    return time.perf_counter()


class BakedRenderer:
    """Renders preview frames from a BakedScene at any resolution."""

    def __init__(self, baked: BakedScene, fill_passes=2):
        self.baked = baked
        self.fill_passes = fill_passes

    def render(self, intrinsics, T_CW, size):
        """intrinsics: (3, 3) camera matrix at `size`; T_CW: (4, 4)
        world->camera IN THE FIELD'S (ngp-converted) WORLD SPACE — i.e.
        np.linalg.inv(core.rays.convert_pose(T_CW_scene_file)); pixel
        rays there follow the OpenCV (+z forward) formula the ray
        generator uses (core/rays.py compute_directions). size:
        (width, height). Returns dict with image (H, W, 3), depth (H, W)
        z-depth, semantic (H, W) class ids."""
        width, height = int(size[0]), int(size[1])
        # Footprint reach is one pixel ring per pass: larger frames need
        # more passes for the same physical splat radius (a 720p wall
        # splat spans ~5 px where the factor-4 preview spans ~1.3).
        # Passes beyond a splat's radius are gated no-ops, so the count
        # only needs to cover the LARGEST visible footprint; each pass
        # is dense VPU rolls (~0.3 ms at 720p on v5e).
        passes = max(self.fill_passes, 4 if width < 640 else 8)
        image, depth, classes, splat_hit = _splat_render(
            self.baked.points, self.baked.rgb, self.baked.sh,
            self.baked.semantic, self.baked.valid,
            jnp.asarray(intrinsics, jnp.float32),
            jnp.asarray(T_CW, jnp.float32), height, width,
            passes, float(self.baked.cell_size))
        return {'image': image, 'depth': depth, 'semantic': classes,
                'splat_hit': splat_hit}
