"""Validity analysis + rendering smoke tests."""

import numpy as np

import epic_tpu
from epic_tpu import analysis, maps, path, viz
from epic_tpu.solver import core


def test_percent_valid_log_space_near_one():
    img = maps.recursive_maze(96, 96, seed=5)
    st = epic_tpu.from_occupancy_image(img, epsilon=1e-3)
    out = core.solve(st)
    pv = analysis.percent_valid(
        np.asarray(out.u), np.asarray(out.locked), img == 255
    )
    assert pv > 0.99


def test_reachability_respects_walls():
    passable = np.zeros((5, 5), dtype=bool)
    passable[1:4, 1] = True
    passable[1, 1:4] = True  # L-shape
    seed = np.zeros((5, 5), dtype=bool)
    seed[3, 1] = True
    reached = analysis.reachable_from(seed, passable)
    assert reached[1, 3] and reached[1, 1]
    assert not reached[3, 3]


def test_render_overlay_and_png(tmp_path):
    img = maps.open_room(40, 40)
    st = epic_tpu.from_occupancy_image(img, epsilon=1e-2)
    out = core.solve(st)
    u, locked = np.asarray(out.u), np.asarray(out.locked)
    p = path.compute_path(u, locked, 5.0, 5.0, 0.2, 0.4, mode="bilinear")
    rgb = viz.render(u, locked, [p])
    assert rgb.shape == (40, 40, 3)
    # Start point green, some path pixel red, goal white, obstacle black.
    assert tuple(rgb[5, 5]) == (0, 255, 0)
    assert (rgb[..., 0] == 255).sum() > (rgb[..., 2] == 255).sum()
    assert tuple(rgb[0, 0]) == (0, 0, 0)
    f = tmp_path / "overlay.png"
    viz.save_png(str(f), rgb)
    loaded = maps.load_png(f)
    assert loaded.shape == (40, 40)


def test_streamline_success_rate_metric():
    img = maps.open_room(48, 48)
    st = epic_tpu.from_occupancy_image(img, epsilon=1e-3)
    out = core.solve(st)
    rate = analysis.streamline_success_rate(
        np.asarray(out.u), np.asarray(out.locked), img == 255, n_samples=40
    )
    assert rate > 0.9


def test_profiling_timed_solve():
    from epic_tpu import profiling
    from epic_tpu.solver import core as score

    img = maps.open_room(24, 24)
    st = epic_tpu.from_occupancy_image(img, epsilon=1e-2)
    out, stats = profiling.timed_solve(score.solve, st, stagger=10)
    assert stats.iterations == int(out.iteration) > 0
    assert stats.wall_s > 0 and stats.cells == 24 * 24
    assert stats.sweeps_per_s > 0 and stats.cell_updates_per_s > 0
    assert stats.time_per_update == stats.wall_s / stats.iterations


def test_percent_valid_3d_volume():
    """The validity metric generalizes to volumes (6-connected fill)."""
    from epic_tpu.grid import make_state
    from epic_tpu.solver import core as core3

    d, h, w = 10, 14, 18
    u0 = np.full((d, h, w), np.float32(-1e6))
    lk = np.zeros((d, h, w), bool)
    lk[0] = lk[-1] = lk[:, 0] = lk[:, -1] = lk[:, :, 0] = lk[:, :, -1] = True
    goal = np.zeros((d, h, w), bool)
    goal[5, 7, 9] = True
    u0[goal] = 0.0
    lk |= goal
    out = core3.solve(make_state(u0, lk, epsilon=1e-3))
    pv = analysis.percent_valid(
        np.asarray(out.u), np.asarray(out.locked), goal
    )
    assert pv > 0.99


def test_reachable_from_3d_respects_walls():
    passable = np.zeros((4, 5, 5), dtype=bool)
    passable[1, 1:4, 1] = True      # a corridor in plane z=1
    passable[2, 3, 1] = True        # one step up in z at its end
    seed = np.zeros((4, 5, 5), dtype=bool)
    seed[1, 1, 1] = True
    reached = analysis.reachable_from(seed, passable)
    assert reached[1, 3, 1] and reached[2, 3, 1]
    assert not reached[3, 3, 3]     # not connected


def test_render_volume_slice_marks_path():
    from epic_tpu.grid import make_state
    from epic_tpu.solver import core as core3
    from epic_tpu import path3d

    d, h, w = 8, 12, 16
    u0 = np.full((d, h, w), np.float32(-1e6))
    lk = np.zeros((d, h, w), bool)
    lk[0] = lk[-1] = lk[:, 0] = lk[:, -1] = lk[:, :, 0] = lk[:, :, -1] = True
    u0[4, 6, 8] = 0.0
    lk[4, 6, 8] = True
    out = core3.solve(make_state(u0, lk, epsilon=1e-2))
    u, locked = np.asarray(out.u), np.asarray(out.locked)
    p = path3d.compute_path(u, locked, 3.0, 3.0, 4.0, 0.2, 0.4)
    rgb = viz.render_volume_slice(u, locked, z=4, paths=[p])
    assert rgb.shape == (h, w, 3)
    reds = (rgb[:, :, 0] > 100) & (rgb[:, :, 1] == 0)
    assert reds.any()               # path pixels landed on the slice


def test_click_streamline_gui_free():
    """The interactive window's click action, exercised without a display
    (the GUI path delegates to viz.click_streamline — reference behaviour:
    a valid click draws the streamline overlay, an obstacle click is
    silently ignored; harmonic_map.py:103-131)."""
    import numpy as np

    import epic_tpu
    from epic_tpu import maps, viz
    from epic_tpu.solver import core

    img = maps.recursive_maze(64, 64, seed=4)
    out = core.solve(epic_tpu.from_occupancy_image(img, epsilon=1e-3))
    u, locked = np.asarray(out.u), np.asarray(out.locked)
    base = viz.render(u, locked)

    free = np.argwhere(~locked)
    fy, fx = free[len(free) // 3]
    overlay = viz.click_streamline(u, locked, float(fx), float(fy),
                                   mode="bilinear")
    assert overlay is not None
    assert overlay.shape == base.shape
    assert (overlay != base).any()  # the streamline actually drew pixels

    oy, ox = map(int, np.argwhere(locked & (u <= -1e5))[0])
    assert viz.click_streamline(u, locked, float(ox), float(oy),
                                mode="bilinear") is None
