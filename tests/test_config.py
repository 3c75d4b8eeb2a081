import numpy as np

from gssdf_tpu.config import Config, DatasetType, load_config, load_yaml


def test_opencv_yaml_dialect(tmp_path):
    p = tmp_path / "cv.yaml"
    p.write_text(
        "%YAML:1.0\n"
        "foo: 1\n"
        "mat: !!opencv-matrix\n"
        "   rows: 2\n"
        "   cols: 2\n"
        "   dt: f\n"
        "   data: [1., 0., 0., 1.]\n"
    )
    d = load_yaml(p)
    assert d["foo"] == 1
    assert d["mat"] == [[1.0, 0.0], [0.0, 1.0]]


def test_cascade(tmp_path):
    (tmp_path / "base.yaml").write_text("lr: 5e-3\nsdf_weight: 1.0\nn_levels: 16\n")
    (tmp_path / "scene.yaml").write_text(
        'base_config: "base.yaml"\ndataset_type: 0\nleaf_sizes: 0.05\n'
        "map:\n   map_size: 14\n"
    )
    (tmp_path / "run.yaml").write_text(
        'scene_config: "scene.yaml"\nsdf_iter_step: 123\nlr: 1e-3\n'
    )
    cfg = load_config(tmp_path / "run.yaml")
    assert cfg.sdf_iter_step == 123
    assert cfg.lr == 1e-3  # run overrides base
    assert cfg.sdf_weight == 1.0
    assert cfg.leaf_size == 0.05
    assert cfg.map_size == 14
    assert cfg.dataset_type == DatasetType.Replica


def test_derived_params():
    cfg = Config(map_size=14.0, leaf_size=0.05).finalize_derived()
    # reference: level = ceil(log2((14 + 0.1) * 20)) = ceil(log2(282)) = 9
    assert cfg.octree_level == 9
    assert cfg.map_resolution == 512
    np.testing.assert_allclose(cfg.full_map_size, 512 * 0.05)
    np.testing.assert_allclose(cfg.truncated_dis, 0.15)
    assert cfg.reset_every == 3000
    np.testing.assert_allclose(cfg.bce_isigma, 100.0)


def test_reference_config_loads():
    """The shipped reference configs parse unchanged."""
    cfg = load_config("/root/reference/config/replica/replica.yaml")
    assert cfg.sdf_iter_step == 5000
    assert cfg.gs_iter_step == 30000
    assert cfg.n_levels == 16
    assert cfg.log2_hashmap_size == 19
    assert cfg.batch_pt_num == 32768
    assert cfg.leaf_size == 0.05
    assert cfg.prune_opa == 0.05
    assert cfg.refine_every == 100
