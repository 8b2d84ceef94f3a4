"""YAML session configs (L5 asset surface): roundtrip, the shipped per-map
files reproduce the reference's tuned budgets
(launch/epic_navigation_node_{maze,umass}.launch:11-12), and the node
consumes them."""

import pathlib

import pytest

from epic_tpu.config import EpicConfig, MeshConfig, ServiceConfig, SolverConfig

CONFIGS = pathlib.Path(__file__).resolve().parent.parent / "configs"


def test_yaml_roundtrip(tmp_path):
    cfg = EpicConfig(
        solver=SolverConfig(epsilon=5e-4, stagger=60, backend="xla"),
        mesh=MeshConfig(shape=(2, 4)),
        service=ServiceConfig(port=7575, steps_per_update=25,
                              update_rate_hz=20.0),
        map="somewhere/map.yaml",
    )
    p = tmp_path / "cfg.yaml"
    cfg.save_yaml(p)
    back = EpicConfig.load_yaml(p)
    assert back.solver == cfg.solver
    assert back.mesh == cfg.mesh
    assert back.service == cfg.service
    assert back.map == cfg.map


def test_unknown_keys_raise(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("solver:\n  epsilonn: 0.1\n")
    with pytest.raises(ValueError, match="unknown solver config keys"):
        EpicConfig.load_yaml(p)
    p.write_text("bogus_section: 1\n")
    with pytest.raises(ValueError, match="unknown config keys"):
        EpicConfig.load_yaml(p)


def test_shipped_maze_config_matches_launch_budget():
    cfg = EpicConfig.load_yaml(CONFIGS / "maze.yaml")
    # launch/epic_navigation_node_maze.launch:11-12
    assert cfg.service.steps_per_update == 50
    assert cfg.service.update_rate_hz == 10.0
    assert cfg.solver.epsilon == 1e-3
    assert cfg.map == "maze.yaml"


def test_shipped_umass_config_matches_launch_budget():
    cfg = EpicConfig.load_yaml(CONFIGS / "umass.yaml")
    # launch/epic_navigation_node_umass.launch:11-12
    assert cfg.service.steps_per_update == 100
    assert cfg.service.update_rate_hz == 30.0


def test_relative_map_resolves_against_config_dir(tmp_path):
    (tmp_path / "m.png").write_bytes(b"x")
    p = tmp_path / "c.yaml"
    p.write_text("map: m.png\n")
    cfg = EpicConfig.load_yaml(p)
    assert cfg.resolve_map_path() == tmp_path / "m.png"
    p.write_text("map: nowhere-such-file.png\n")
    cfg = EpicConfig.load_yaml(p)
    with pytest.raises(FileNotFoundError):
        cfg.resolve_map_path()


def test_node_consumes_session_config(tmp_path):
    """A config-driven node session: tuned budget lands in the planner and
    the anytime tick advances by steps_per_update."""
    import numpy as np

    from epic_tpu.services import messages as msg
    from epic_tpu.services.navigation_node import EpicNavigationNodeRviz

    cfg = EpicConfig.load_yaml(CONFIGS / "maze.yaml")
    node = EpicNavigationNodeRviz(cfg, update_rate=cfg.service.update_rate_hz)
    assert node.update_rate == 10.0
    occ = np.zeros((16, 16), dtype=np.int8)
    occ[0, :] = occ[-1, :] = occ[:, 0] = occ[:, -1] = 100
    node.sub_occupancy_grid(msg.OccupancyGrid(16, 16, 1.0, 0.0, 0.0, occ))
    node.srv_add_goals(msg.ModifyGoalsRequest([msg.PoseStamped(8.0, 8.0)]))
    it0 = int(node.planner.state.iteration)
    node.planner.update()
    assert int(node.planner.state.iteration) == it0 + cfg.service.steps_per_update


def test_viz_profile_roundtrip_and_shipped_defaults():
    """The viz section (the rviz/default.rviz analog) serializes and the
    shipped maze config carries a display profile."""
    from epic_tpu.config import VizConfig

    cfg = EpicConfig(viz=VizConfig(show_field=False, interpolation="reference",
                                   starts=3))
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as td:
        p = pathlib.Path(td) / "v.yaml"
        cfg.save_yaml(p)
        back = EpicConfig.load_yaml(p)
    assert back.viz == cfg.viz
    shipped = EpicConfig.load_yaml(CONFIGS / "maze.yaml")
    assert shipped.viz.interpolation == "bilinear"
    assert shipped.viz.starts == 6


def test_map_name_does_not_resolve_to_config_itself(tmp_path):
    """A session config whose ``map`` shares its own filename must not
    resolve to ITSELF (configs/maze.yaml names its map maze.yaml; the
    unguarded lookup parsed the session config as a map_server YAML)."""
    p = tmp_path / "maze.yaml"
    p.write_text("map: maze.yaml\n")
    cfg = EpicConfig.load_yaml(p)
    try:
        r = cfg.resolve_map_path()  # may find the reference fixture
    except FileNotFoundError:
        r = None
    assert r is None or r.resolve() != p.resolve()
    # A config map name with no fixture anywhere raises cleanly.
    p3 = tmp_path / "nonesuch-xyz.yaml"
    p3.write_text("map: nonesuch-xyz.yaml\n")
    with pytest.raises(FileNotFoundError):
        EpicConfig.load_yaml(p3).resolve_map_path()
    # With a distinct real file of that name present, it resolves to it.
    sub = tmp_path / "maps"
    sub.mkdir()
    (sub / "maze.yaml").write_text("image: maze.png\n")
    p2 = tmp_path / "session.yaml"
    p2.write_text("map: maps/maze.yaml\n")
    cfg2 = EpicConfig.load_yaml(p2)
    assert cfg2.resolve_map_path() == sub / "maze.yaml"
