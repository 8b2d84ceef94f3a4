"""Map ingest (YAML + PNG) and checkpoint save/resume."""

import numpy as np
import pytest

import epic_tpu
from epic_tpu import checkpoint, maps
from epic_tpu.solver import core


def test_png_roundtrip(tmp_path):
    img = maps.recursive_maze(64, 64, seed=1)
    from PIL import Image

    p = tmp_path / "m.png"
    Image.fromarray(img).save(p)
    loaded = maps.load_png(p)
    np.testing.assert_array_equal(loaded, img)


def test_map_server_yaml(tmp_path):
    img = maps.open_room(32, 48)
    from PIL import Image

    Image.fromarray(img).save(tmp_path / "room.png")
    (tmp_path / "room.yaml").write_text(
        "image: room.png\nresolution: 0.05\norigin: [-1.0, -2.0, 0.0]\n"
        "occupied_thresh: 0.65\nfree_thresh: 0.196\nnegate: 0\n"
    )
    loaded, meta = maps.load_map_server_yaml(tmp_path / "room.yaml")
    assert loaded.shape == (32, 48)
    assert meta.resolution == 0.05
    assert meta.origin_x == -1.0 and meta.origin_y == -2.0


@pytest.mark.skipif(
    maps.reference_map_path("maze.png") is None,
    reason="reference tree not mounted",
)
def test_reference_maze_yaml_loads():
    img, meta = maps.load_map_server_yaml("/root/reference/maps/maze.yaml")
    assert img.shape == (482, 482)
    assert meta.resolution == pytest.approx(0.1)


def test_checkpoint_resume_equals_continuous(tmp_path):
    img = maps.random_obstacles(24, 24, density=0.1, seed=2)
    st = epic_tpu.from_occupancy_image(img, epsilon=1e-3)
    mid = core.update_n(st, 7)
    checkpoint.save(tmp_path / "ck.npz", mid)
    resumed = checkpoint.load(tmp_path / "ck.npz")
    assert int(resumed.iteration) == 7
    a = core.update_n(mid, 5)
    b = core.update_n(resumed, 5)
    np.testing.assert_array_equal(np.asarray(a.u), np.asarray(b.u))
    assert float(a.delta) == float(b.delta)


def test_planner_session_checkpoint_roundtrip(tmp_path):
    """A planner survives save -> process restart -> load and resumes warm:
    same fields, transforms, pause flag, and identical further relaxation."""
    from epic_tpu import checkpoint
    from epic_tpu.planner import Planner, PlannerConfig

    pl = Planner(PlannerConfig(epsilon=1e-2, resolution=0.5,
                               origin_x=-2.0, origin_y=3.0))
    pl.init(32, 32)
    pl.add_goals([(6.0, 11.0)])  # world coords through the transform
    pl.update(101)
    pl.set_status(True)

    p = tmp_path / "session.npz"
    checkpoint.save_planner(p, pl)
    restored = checkpoint.load_planner(p)

    assert restored.paused is True
    assert restored.config.resolution == 0.5
    assert restored.config.origin_x == -2.0
    np.testing.assert_array_equal(
        np.asarray(restored.state.u), np.asarray(pl.state.u))
    assert int(restored.state.iteration) == int(pl.state.iteration)

    # Warm continuation is identical on both sides.
    restored.set_status(False)
    pl.set_status(False)
    restored.update(50)
    pl.update(50)
    np.testing.assert_array_equal(
        np.asarray(restored.state.u), np.asarray(pl.state.u))


def test_load_planner_config_override_not_mutated():
    from epic_tpu import checkpoint
    from epic_tpu.planner import Planner, PlannerConfig

    pl = Planner(PlannerConfig(epsilon=1e-2))
    pl.init(16, 16)
    pl.add_goals([(8.0, 8.0)])
    p = tmp = None
    import tempfile, pathlib
    tmp = pathlib.Path(tempfile.mkdtemp()) / "s.npz"
    checkpoint.save_planner(tmp, pl)

    mine = PlannerConfig(epsilon=5e-4, backend="xla")
    restored = checkpoint.load_planner(tmp, config=mine)
    # Caller's object untouched; override applied to the resumed state.
    assert mine.epsilon == 5e-4 and mine.resolution == 1.0
    assert restored.config.epsilon == 5e-4
    assert float(restored.state.epsilon) == np.float32(5e-4)
    # Without an override the snapshot's epsilon rules.
    restored2 = checkpoint.load_planner(tmp)
    assert restored2.config.epsilon == np.float32(1e-2)


def test_volume_planner_checkpoint_roundtrip(tmp_path):
    """A 3D planner session survives a process restart warm (the 3D twin of
    the 2D session checkpoint)."""
    import epic_tpu
    from epic_tpu import checkpoint

    p = epic_tpu.VolumePlanner(epic_tpu.VolumePlannerConfig(
        epsilon=1e-2, resolution=0.5, origin_x=-1.0, origin_y=2.0,
        origin_z=0.5, steps_per_update=21,
    ))
    p.init(20, 16, 12)
    p.add_goals([(3.0, 5.0, 3.0)])
    p.update(30)
    p.set_status(True)
    f = tmp_path / "vol_session.npz"
    checkpoint.save_volume_planner(f, p)

    q = checkpoint.load_volume_planner(f)
    assert q.paused and q.config.steps_per_update == 21
    assert q.config.origin_z == 0.5 and q.config.resolution == 0.5
    assert int(q.state.iteration) == 30
    np.testing.assert_array_equal(np.asarray(q.state.u), np.asarray(p.state.u))

    # Warm continuation equals uninterrupted relaxation.
    q.set_status(False)
    q.update(10)
    p.set_status(False)
    p.update(10)
    np.testing.assert_array_equal(np.asarray(q.state.u), np.asarray(p.state.u))
