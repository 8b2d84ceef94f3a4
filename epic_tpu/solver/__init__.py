from . import (
    batched,
    host_solve,
    batched_path3d,
    cascade,
    batched_path,
    core,
    legacy,
    pallas_batched,
    pallas_biggrid,
    pallas_biggrid3d,
    pallas_sweep,
    pallas_sweep3d,
    pallas_tiled2d,
    pallas_tiled3d,
    reference_np,
)

__all__ = [
    "batched",
    "host_solve",
    "batched_path3d",
    "cascade",
    "batched_path",
    "core",
    "legacy",
    "pallas_batched",
    "pallas_biggrid",
    "pallas_biggrid3d",
    "pallas_sweep",
    "pallas_sweep3d",
    "pallas_tiled2d",
    "pallas_tiled3d",
    "reference_np",
]


def solve_grid(state, stagger=None, **kw):
    """Auto-dispatching 2D solve — the library-level twin of the Planner's
    kernel selection (planner.py::_select_module) and the functional
    equivalent of Harmonic.solve(process='gpu') with its CPU fallback
    (libepic/python/epic/harmonic.py:54-107): XLA on CPU hosts, the
    VMEM-resident Pallas kernel when the grid fits (~2M cells), the banded
    big-grid kernel otherwise. Protocol identical across all three. Grids of
    rank != 2 (3D/4D+) go through core.solve on CPU, the 3D kernels via
    :func:`solve_volume`, and core's generic XLA path otherwise.

    NOTE for tunnelled/remote-worker TPU environments: a solve is ONE device
    dispatch; on mega-grids (>= 16k wide) the protocol's >= max(H, W)-sweep
    floor can exceed a remote worker's dispatch watchdog (~60 s — see
    docs/BENCH_NOTES.md). Cap ``max_iterations`` so a single dispatch stays
    under ~45 s there and loop on ``converged`` from the host — or pass
    ``segment_iterations=N``: the big-grid regimes then run
    ``solve_segments`` (the SAME compiled while loop resumed across
    dispatch segments, trajectories bit-identical — the 16384² BASELINE
    grid converges in ~173 s on one chip this way). Real hosts need no
    cap."""
    import jax as _jax

    from .. import constants as _C

    stagger = _C.DEFAULT_STAGGER if stagger is None else stagger
    if state.u.ndim == 3:
        return solve_volume(state, stagger, **kw)
    if state.u.ndim != 2 or _jax.default_backend() == "cpu":
        # core.solve knows nothing of kernel tiling; drop kernel-only
        # kwargs so the same call works on every backend.
        kw = {kk: v for kk, v in kw.items() if kk == "max_iterations"}
        return core.solve(state, stagger, **kw)
    if pallas_sweep.fits_vmem(state.u.shape):
        # The VMEM kernel has no tiling layout; drop big-grid-only kwargs
        # (its whole solve is one short kernel — segmentation is moot).
        kw = {kk: v for kk, v in kw.items()
              if kk not in ("chunk_depth", "segment_iterations")}
        return pallas_sweep.solve(state, stagger, **kw)
    # Evaluate the regime rule at the SAME chunk depth the solve will pad
    # with (mirrors Planner._kernel_module).
    mod = (pallas_tiled2d
           if pallas_tiled2d.prefer_tiled(state.u.shape,
                                          kw.get("chunk_depth", 16))
           else pallas_biggrid)
    fn = mod.solve_segments if "segment_iterations" in kw else mod.solve
    return fn(state, stagger, **kw)


def update_grid(state, num_steps, **kw):
    """Auto-dispatching 2D anytime stepper; see :func:`solve_grid`."""
    import jax as _jax

    if state.u.ndim == 3:
        return update_volume(state, num_steps, **kw)
    if state.u.ndim != 2 or _jax.default_backend() == "cpu":
        return core.update_n(state, num_steps)  # kernel-only kwargs dropped
    if pallas_sweep.fits_vmem(state.u.shape):
        kw = {kk: v for kk, v in kw.items() if kk != "chunk_depth"}
        return pallas_sweep.update_n(state, num_steps, **kw)
    if pallas_tiled2d.prefer_tiled(state.u.shape, kw.get("chunk_depth", 16)):
        return pallas_tiled2d.update_n(state, num_steps, **kw)
    return pallas_biggrid.update_n(state, num_steps, **kw)


def solve_volume(state, stagger=None, **kw):
    """Auto-dispatching 3D solve (the 3D analogue of PlannerConfig
    backend="auto"): XLA on CPU hosts; on TPU the VMEM-resident kernel
    when the volume fits (~2M cells), the plane-banded big-volume kernel
    when its layout fits scoped VMEM, the (z, y, x)-tiled kernel for
    wide-plane volumes, and XLA as the last resort (tiny-dim wide-plane
    shapes no tiled layout covers). Protocol identical across all paths
    (harmonic_complete_cpu)."""
    import jax as _jax

    from .. import constants as _C

    if state.u.ndim != 3:
        raise ValueError(f"solve_volume requires a 3D grid, got {state.u.ndim}D")
    stagger = _C.DEFAULT_STAGGER if stagger is None else stagger
    if _jax.default_backend() == "cpu":
        kw = {kk: v for kk, v in kw.items() if kk == "max_iterations"}
        return core.solve(state, stagger, **kw)
    if pallas_sweep3d.fits_vmem(state.u.shape):
        kw = {kk: v for kk, v in kw.items()
              if kk not in ("chunk_depth", "segment_iterations")}
        return pallas_sweep3d.solve(state, stagger, **kw)
    segmented = "segment_iterations" in kw
    if pallas_biggrid3d.feasible(state.u.shape):
        fn = (pallas_biggrid3d.solve_segments if segmented
              else pallas_biggrid3d.solve)
        return fn(state, stagger, **kw)
    # Wide-plane volumes (a single padded plane > ~700k cells) cannot fit
    # even a minimal 3-plane extended band in scoped VMEM (probe24 wall);
    # run the (z, y, x)-tiled kernel there, XLA as the last resort.
    if pallas_tiled3d.feasible(state.u.shape):
        fn = (pallas_tiled3d.solve_segments if segmented
              else pallas_tiled3d.solve)
        return fn(state, stagger, **kw)
    kw = {kk: v for kk, v in kw.items() if kk == "max_iterations"}
    return core.solve(state, stagger, **kw)


def update_volume(state, num_steps, **kw):
    """Auto-dispatching 3D anytime stepper; see :func:`solve_volume`."""
    import jax as _jax

    if state.u.ndim != 3:
        raise ValueError(f"update_volume requires a 3D grid, got {state.u.ndim}D")
    if _jax.default_backend() == "cpu":
        return core.update_n(state, num_steps)
    if pallas_sweep3d.fits_vmem(state.u.shape):
        kw = {kk: v for kk, v in kw.items() if kk != "chunk_depth"}
        return pallas_sweep3d.update_n(state, num_steps, **kw)
    if pallas_biggrid3d.feasible(state.u.shape):
        return pallas_biggrid3d.update_n(state, num_steps, **kw)
    if pallas_tiled3d.feasible(state.u.shape):
        return pallas_tiled3d.update_n(state, num_steps, **kw)
    return core.update_n(state, num_steps)  # tiny-dim wide-plane fallback


__all__ += ["solve_grid", "update_grid", "solve_volume", "update_volume"]
