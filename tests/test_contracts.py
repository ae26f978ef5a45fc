"""CLI/stdout contracts the reference's harnesses rely on."""

import numpy as np

from mccnn_tpu.config import make_config, parse_args, print_args, cmd_str


def test_parse_args_defaults_match_tables():
    cfg, tail = parse_args(["kitti", "fast", "-a", "test_te"])
    assert cfg.l1 == 4 and cfg.fm == 64 and cfg.lr == 0.002
    assert cfg.pi1 == 4.0 and cfg.pi2 == 55.72  # main.lua:222-234
    cfg2, _ = parse_args(["mb", "slow", "-a", "train_tr"])
    assert cfg2.l1 == 5 and cfg2.fm == 112 and cfg2.false2 == 18.0
    assert cfg2.L1 == 14  # main.lua:132-144


def test_cmd_str_embeds_flags():
    cfg, tail = parse_args(["kitti", "fast", "-a", "test_te", "-pi1", "2.3"])
    assert cmd_str(cfg, tail) == "kitti_fast_-a_test_te_-pi1_2.3"


def test_print_args_paper_notation(capsys):
    """main.lua:299-322: paper-name mapping, incl. the derived values
    sgm_P2 = pi1*pi2 and sgm_Q2 = q1*q2."""
    cfg = make_config("kitti", "fast")
    print_args(cfg)
    out = capsys.readouterr().out
    lines = dict(l.split(maxsplit=1)[::-1] for l in out.strip().split("\n"))
    assert float(lines["arch_patch_size"]) == cfg.ws
    assert float(lines["sgm_P2"]) == cfg.pi1 * cfg.pi2
    assert float(lines["sgm_Q2"]) == cfg.sgm_q1 * cfg.sgm_q2


def test_apply_device_selects_backend_and_index():
    """-backend/-gpu pin jax's default device (1-based, like
    cutorch.setDevice, main.lua:16,342)."""
    import jax

    from mccnn_tpu.cli import apply_device

    prev = jax.config.jax_default_device
    try:
        cfg = make_config("kitti", "fast", backend="cpu", gpu=3)
        apply_device(cfg)
        dev = jax.config.jax_default_device
        assert dev is not None and dev.platform == "cpu"
        assert dev == jax.devices("cpu")[2]

        # out-of-range index is a usage error
        cfg_bad = make_config("kitti", "fast", backend="cpu", gpu=999)
        try:
            apply_device(cfg_bad)
            assert False, "expected SystemExit"
        except SystemExit:
            pass
    finally:
        jax.config.update("jax_default_device", prev)


def test_trainer_step_count_matches_reference_loop():
    """main.lua:789 `for t = 1, N - bs/2, bs/2` — the last partial
    stride still runs a full batch when N % bs/2 != 0."""

    from mccnn_tpu.train.trainer import n_epoch_steps as steps

    def lua_steps(n, bs_half):
        t, c = 1, 0
        while t <= n - bs_half:
            c += 1
            t += bs_half
        return c

    for n in (64, 65, 127, 128, 129, 192, 193, 1000):
        assert steps(n, 64) == lua_steps(n, 64), n


def test_eval_score_is_last_stdout_token(capsys):
    """hs.py:209-211 parses the score from the LAST stdout token."""
    from mccnn_tpu.data.datasets import load_kitti, make_synthetic_kitti
    from mccnn_tpu.train.evaluate import action_eval
    from mccnn_tpu.cli import init_params
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        make_synthetic_kitti(os.path.join(d, "data.kitti"), n_images=2,
                             height=40, width=80, disp_max=8)
        cfg = make_config("kitti", "ad", a="test_te", data_dir=d)
        ds = load_kitti(cfg)
        ds.disp_max = 8
        action_eval(cfg, [], params=None, ds=ds)
    out = capsys.readouterr().out.strip()
    score = float(out.split()[-1])
    assert 0.0 <= score <= 1.0
