import os
import textwrap

from sd_video_gen_tpu.config import Config, load_config, sweep_grid, parse_config_args


def _write_cfg(tmp_path, name="unit_cfg", extra=""):
    body = textwrap.dedent("""\
        LR:
         - 0.00001
        BATCH_SIZE:
         - 6
        EPOCHS:
         - 3
        EPOCH_RATIO:
         - 1
        NUM_WORKERS:
         - 0
        FRAMES_PER_CLIP:
         - 5
        FRAMES_TO_PREDICT:
         - 5
        STRIDE:
         - 1
        FPS:
         - 3
        FRAME_SIZE: 128
        DIM_MODEL:
         - 2048
        NUM_HEADS:
         - 8
        NUM_ENCODER_LAYERS:
         - 4
        NUM_DECODER_LAYERS:
         - 8
        DROPOUT_P:
         - 0.1
        USE_MSE:
         - True
        USE_GDL:
         - True
        LAMBDA_GDL:
         - 1
        ALPHA:
         - 1
        USE_CONTRASTIVE:
         - True
        LAMBDA_CONTRASTIVE:
         - 0.025
    """) + extra
    p = tmp_path / (name + ".yml")
    p.write_text(body)
    return str(tmp_path)


def test_load_reference_schema(tmp_path):
    d = _write_cfg(tmp_path)
    cfg = load_config("unit_cfg", d)
    assert cfg.lr == 1e-5
    assert cfg.batch_size == 6
    assert cfg.frame_size == 128
    assert cfg.dim_model == 2048
    assert cfg.latent_hw == 16
    assert cfg.latent_dim == 4 * 16 * 16  # models/transformer.py:37 semantics
    assert cfg.use_contrastive is True
    assert cfg.use_l1 is False  # absent key -> default (52 of 60 ref configs)


def test_sweep_grid_product(tmp_path):
    d = _write_cfg(tmp_path, extra="")
    p = tmp_path / "unit_cfg.yml"
    p.write_text(p.read_text().replace("LR:\n - 0.00001",
                                       "LR:\n - 0.00001\n - 0.0001"))
    grid = sweep_grid("unit_cfg", d)
    assert len(grid) == 2
    assert {c.lr for c in grid} == {1e-5, 1e-4}


def test_cli_parity(tmp_path):
    d = _write_cfg(tmp_path)
    cfg, args = parse_config_args([
        "--dataset", "ball", "--config", "unit_cfg", "--config_dir", d,
        "--pred_frames", "10", "--denoise", "True", "--save_best", "False",
        "--denoise_start_step", "45",
    ])
    assert args.dataset == "ball"
    assert args.pred_frames == 10
    assert args.denoise is True
    assert args.save_best is False
    assert args.denoise_start_step == 45
    assert cfg.config_name == "unit_cfg"


def test_config_immutable(tmp_path):
    d = _write_cfg(tmp_path)
    cfg = load_config("unit_cfg", d)
    try:
        cfg.lr = 1.0
        raised = False
    except Exception:
        raised = True
    assert raised


def test_full_reference_config_corpus():
    """All 60 reference YAMLs ship in configs/ and parse into valid Configs
    (VERDICT: '--config 11_27_ucf_final works out of the box')."""
    import glob
    import os
    from sd_video_gen_tpu.config import sweep_grid

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    names = sorted(os.path.basename(p)[:-4]
                   for p in glob.glob(os.path.join(root, "*.yml")))
    assert "11_27_ucf_final" in names and "config_test" in names
    assert len(names) >= 60
    for name in names:
        grid = sweep_grid(name, root)
        assert len(grid) >= 1
        cfg = grid[0]
        assert isinstance(cfg.lr, float) and 0 < cfg.lr < 1
        assert isinstance(cfg.batch_size, int) and cfg.batch_size >= 1
        assert isinstance(cfg.frame_size, int) and cfg.frame_size in (64, 128)
        assert cfg.dim_model % cfg.num_heads == 0


def test_unknown_yaml_keys_warn(tmp_path):
    """Keys outside the reference UPPERCASE schema must warn, not silently
    fall back to flagship defaults (a lowercase 'dim_model:' otherwise
    trains the 2048-wide model unasked)."""
    import warnings

    from sd_video_gen_tpu.config import load_config

    (tmp_path / "oops.yml").write_text(
        "dim_model:\n - 32\nBATCH_SIZE:\n - 2\n")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        cfg = load_config("oops", str(tmp_path))
    msgs = [str(r.message) for r in rec]
    assert any("dim_model" in m and "DIM_MODEL" in m for m in msgs)
    assert cfg.batch_size == 2          # recognized key applied
    assert cfg.dim_model == 2048        # unmatched key kept the default

    # a fully reference-schema file stays silent
    (tmp_path / "clean.yml").write_text("DIM_MODEL:\n - 32\n")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        cfg = load_config("clean", str(tmp_path))
    assert not rec and cfg.dim_model == 32
