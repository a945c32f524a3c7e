"""The public CLI surface must accept the reference's invocations
unchanged (BASELINE.json requires scripts to run as-is)."""

from ust_run_tpu.config import build_parser, config_from_args


def test_reference_train_invocation_parses():
    # README.md:29-style invocation of the reference
    argv = ("--dataset fundus --lb_domain 1 --lb_num 20 --save_name exp1 "
            "--overwrite --gpu 0 --seed 1337 --base_lr 0.03 "
            "--threshold 0.95 --ema_decay 0.99 --consistency 1.0 "
            "--consistency_rampup 200 --cutmix_prob 1.0 --LB 0.01 "
            "--increase 1.0005 --queue_len 10 --amp 1 --label_bs 4 "
            "--unlabel_bs 4 --test_bs 1 --domain_num 4 --num_eval_iter 500 "
            "--max_iterations 30000 --deterministic 1 --load_path x.pth "
            "--consistency_type mse --depth 28 --widen_factor 2 "
            "--leaky_slope 0.1 --bn_momentum 0.1 --dropout 0.0").split()
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args).resolve()
    assert cfg.dataset == "fundus"
    assert cfg.label_bs == 4 and cfg.unlabel_bs == 4   # forced (train.py:408)
    assert cfg.max_iterations == 30000
    assert cfg.domain_num == 4
    assert cfg.labeled_count() == 20


def test_lb_ratio_overrides_lb_num():
    args = build_parser().parse_args(
        "--dataset prostate --lb_ratio 0.1 --lb_num 40".split())
    cfg = config_from_args(args).resolve()
    # train.py:474-477: lb_num = int(sum(domain_len) * ratio)
    assert cfg.labeled_count() == int(sum(cfg.profile().domain_len) * 0.1)


def test_mnms_parser():
    args = build_parser(mnms=True).parse_args("--lb_domain 2".split())
    assert args.dataset == "MNMS"
    cfg = config_from_args(args).resolve()
    assert cfg.profile().num_classes == 4
    assert cfg.profile().parts == ("lv", "myo", "rv")


def test_flags_and_defaults_match_reference():
    # every reference flag name exists with the reference default
    p = build_parser()
    defaults = {a.dest: a.default for a in p._actions}
    expected = {
        "dataset": "BUSI", "save_name": "debug", "model": "unet",
        "max_iterations": 60000, "num_eval_iter": 500, "deterministic": 1,
        "base_lr": 0.03, "seed": 1337, "gpu": "0", "threshold": 0.95,
        "amp": 1, "label_bs": 4, "unlabel_bs": 4, "test_bs": 1,
        "domain_num": 6, "lb_domain": 1, "lb_num": 40, "lb_ratio": 0,
        "ema_decay": 0.99, "consistency_type": "mse", "consistency": 1.0,
        "consistency_rampup": 200.0, "depth": 28, "widen_factor": 2,
        "leaky_slope": 0.1, "bn_momentum": 0.1, "dropout": 0.0,
        "cutmix_prob": 1.0, "LB": 0.01, "increase": 1.0005, "queue_len": 10,
    }
    for k, v in expected.items():
        assert defaults[k] == v, (k, defaults[k], v)
