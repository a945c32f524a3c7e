"""End-to-end tests of the fused SSL train step on tiny shapes (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ust_run_tpu.models import UNet
from ust_run_tpu.semisup import (HyperParams, create_train_state,
                                 make_train_step)
from ust_run_tpu.semisup.step import unpack_metrics
from ust_run_tpu.semisup.state import reset_epoch

pytestmark = pytest.mark.slow


def tiny_hp(dataset="prostate", multilabel=False, n_part=1, num_classes=2,
            channels=1):
    return HyperParams(
        dataset=dataset, patch=64, channels=channels,
        num_classes=num_classes, multilabel=multilabel, n_part=n_part,
        label_bs=2, unlabel_bs=2, queue_len=4, domain_num=2,
        threshold=0.95, cutmix_prob=1.0, LB=0.01, increase=1.0005,
        consistency=1.0, consistency_rampup=200.0, max_iterations=100,
        ema_decay=0.99, base_lr=0.03, min_v=0.1, max_v=2.0, fillcolor=255,
        blur_radius=3)


def fake_data(hp, seed=0, n=6):
    """HBM-resident corpus dict (the step gathers batches from it)."""
    rng = np.random.RandomState(seed)
    k = 1 if hp.dataset != "MNMS" else 3

    def lab(shape):
        if hp.dataset == "fundus":
            return rng.choice([0, 128, 255], shape).astype(np.uint8)
        return rng.choice([0, 255], shape).astype(np.uint8)

    return {
        "lb_img": rng.randint(0, 256, (n, 64, 64, hp.channels)
                              ).astype(np.uint8),
        "lb_lab": lab((n, 64, 64, k)),
        "ulb_img": rng.randint(0, 256, (n, 64, 64, hp.channels)
                               ).astype(np.uint8),
        "ulb_lab": lab((n, 64, 64, k)),
        "ulb_dc": np.asarray([1, 2] * (n // 2), np.int32),
    }


def fake_batch(hp, seed=0, n=6):
    rng = np.random.RandomState(100 + seed)
    return {
        "lb_idx": rng.randint(0, n, hp.label_bs).astype(np.int32),
        "ulb_idx": rng.randint(0, n, hp.unlabel_bs).astype(np.int32),
    }


@pytest.fixture(scope="module")
def prostate_setup():
    hp = tiny_hp()
    model = UNet(n_channels=hp.channels, n_classes=hp.num_classes)
    step = make_train_step(model, hp)
    return hp, model, step


def test_step_runs_and_updates(prostate_setup):
    hp, model, step = prostate_setup
    state = create_train_state(model, hp, seed=0)
    batch = fake_batch(hp)
    p0 = np.array(state.params["outc"]["kernel"])  # copy before donation
    new_state, metrics = step(state, fake_data(hp), batch)
    metrics = unpack_metrics(np.asarray(metrics), hp)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["sup_loss"]))
    assert not np.allclose(np.asarray(new_state.params["outc"]["kernel"]),
                           p0)
    # first EMA update has alpha=0 -> teacher == student (train.py:91)
    np.testing.assert_allclose(
        np.asarray(new_state.ema_params["outc"]["kernel"]),
        np.asarray(new_state.params["outc"]["kernel"]), rtol=1e-6)
    # epoch 0: hardness forced to 1 -> queue must stay empty (train.py:711)
    assert int(metrics["queue_count"]) == 0
    assert int(metrics["cur_simple_num"]) == 0
    # LQ carry becomes valid after the first step (train.py:749-751)
    assert bool(new_state.lq.valid)


def test_multi_step_and_lq_branch(prostate_setup):
    hp, model, step = prostate_setup
    state = create_train_state(model, hp, seed=0)
    batch = fake_batch(hp)
    s1, m1 = step(state, fake_data(hp), batch)
    s2, m2 = step(s1, fake_data(hp), fake_batch(hp, seed=1))
    m1 = unpack_metrics(np.asarray(m1), hp)
    m2 = unpack_metrics(np.asarray(m2), hp)
    assert int(s2.step) == 2
    assert np.isfinite(float(m2["loss"]))
    # consistency weight follows the staircase (train.py:819-820)
    assert float(m1["consistency_weight"]) > 0


def test_queue_fills_when_threshold_high(prostate_setup):
    hp, model, step = prostate_setup
    state = create_train_state(model, hp, seed=0)
    # epoch 1 + generous threshold -> every sample is "simple"
    state = reset_epoch(state, 1)
    state = state.replace(choice_th=jnp.asarray(2.0, jnp.float32))
    s, m = step(state, fake_data(hp), fake_batch(hp))
    m = unpack_metrics(np.asarray(m), hp)
    assert int(m["cur_simple_num"]) == hp.unlabel_bs
    assert int(m["queue_count"]) == hp.unlabel_bs
    # run more steps: queue caps at queue_len with newest entries first
    th = 2.0
    for i in range(3):
        s = s.replace(choice_th=jnp.asarray(th, jnp.float32))
        s, m = step(s, fake_data(hp), fake_batch(hp, seed=i + 10))
    m = unpack_metrics(np.asarray(m), hp)
    assert int(m["queue_count"]) == hp.queue_len
    assert np.asarray(s.queue.valid).all()
    # choice_th clamps to the max hardness in the buffer (train.py:764,777)
    assert float(s.choice_th) <= np.asarray(s.queue.hardness).max() + 1e-6


def test_epoch_reset_invalidates_lq(prostate_setup):
    hp, model, step = prostate_setup
    state = create_train_state(model, hp, seed=0)
    s, _ = step(state, fake_data(hp), fake_batch(hp))
    assert bool(s.lq.valid)
    s = reset_epoch(s, 1)
    assert not bool(s.lq.valid)


def test_fundus_multilabel_variant():
    hp = tiny_hp(dataset="fundus", multilabel=True, n_part=2, channels=3)
    model = UNet(n_channels=3, n_classes=2)
    state = create_train_state(model, hp, seed=0)
    step = make_train_step(model, hp)
    batch = fake_batch(hp)
    new_state, metrics = step(state, fake_data(hp), batch)
    metrics = unpack_metrics(np.asarray(metrics), hp)
    assert np.isfinite(float(metrics["loss"]))
    assert metrics["ulb_dice"].shape == (2,)
    assert new_state.queue.pl.shape == (4, 64, 64, 2)


def test_step_deterministic(prostate_setup):
    hp, model, step = prostate_setup
    b = fake_batch(hp)
    # donated buffers: rebuild state for each call
    s_a = create_train_state(model, hp, seed=0)
    s_b = create_train_state(model, hp, seed=0)
    _, m1 = step(s_a, fake_data(hp), b)
    _, m2 = step(s_b, fake_data(hp), b)
    m1 = unpack_metrics(np.asarray(m1), hp)
    m2 = unpack_metrics(np.asarray(m2), hp)
    assert float(m1["loss"]) == float(m2["loss"])


def test_lq_loss_flag_semantics():
    """Pin the LQ-term gating (README parity notes).

    Upstream, the LQ concat branch is dead (train.py:743 assigns
    logits_ul_lq=None; the reassignment at :822-823 is inside the
    `is not None` gate), so by default the term must NOT contribute.
    With --lq_consistency it must contribute exactly from the first step
    where the LQ carry is valid (step 2 onward).
    """
    import dataclasses

    from ust_run_tpu.config import TrainConfig
    from ust_run_tpu.semisup.step import HyperParams

    # config default routes to reference-faithful behavior
    assert HyperParams.from_config(
        TrainConfig(dataset="prostate").resolve()).lq_loss is False

    hp_off = tiny_hp()
    hp_on = dataclasses.replace(hp_off, lq_loss=True)
    assert hp_off.lq_loss is False
    model = UNet(n_channels=hp_off.channels, n_classes=hp_off.num_classes)
    step_off = make_train_step(model, hp_off)
    step_on = make_train_step(model, hp_on)

    data, b0, b1 = fake_data(hp_off), fake_batch(hp_off, 0), fake_batch(
        hp_off, 1)
    s_off = create_train_state(model, hp_off, seed=0)
    s_on = create_train_state(model, hp_on, seed=0)

    s_off, m_off1 = step_off(s_off, data, b0)
    s_on, m_on1 = step_on(s_on, data, b0)
    m_off1 = unpack_metrics(np.asarray(m_off1), hp_off)
    m_on1 = unpack_metrics(np.asarray(m_on1), hp_on)
    # step 1: LQ carry invalid in both -> identical losses (tight
    # tolerance: the two programs compile separately)
    assert np.isclose(float(m_off1["loss"]), float(m_on1["loss"]),
                      rtol=1e-6, atol=0)
    assert np.isclose(float(m_off1["unsup_loss_ul"]),
                      float(m_on1["unsup_loss_ul"]), rtol=1e-6, atol=0)

    s_off, m_off2 = step_off(s_off, data, b1)
    s_on, m_on2 = step_on(s_on, data, b1)
    m_off2 = unpack_metrics(np.asarray(m_off2), hp_off)
    m_on2 = unpack_metrics(np.asarray(m_on2), hp_on)
    # step 2: carry valid; only the ul term (and the total) may move,
    # and it must actually move — the flag is load-bearing.
    assert not np.isclose(float(m_off2["unsup_loss_ul"]),
                          float(m_on2["unsup_loss_ul"]), rtol=1e-6, atol=0)
    # teacher-side quantities are independent of the student loss form
    np.testing.assert_allclose(m_off2["ulb_dice"], m_on2["ulb_dice"],
                               rtol=1e-5)
    assert np.isclose(float(m_off2["mask_ratio"]),
                      float(m_on2["mask_ratio"]), rtol=1e-6, atol=0)


def test_hardness_fold_matches_split(prostate_setup):
    """The shipped step folds ALL SIX student passes — the grad-free
    hardness forward (train.py:668) plus the five loss passes
    (train.py:699-702, 740) — into one 21-image six-group BN call. The
    reference runs them as separate sequential forwards. This test pins
    the end-to-end equivalence of the fold against the reference-shaped
    split form [1-group w forward, then 17-image 5-group call seeded
    from its running stats]: loss, grads, final batch_stats, and the
    hardness logits must agree on identical inputs (CPU, f32). It fails
    if the fold order ever drifts from the reference's forward order
    [w, lb, ul, lu, s, lq]. (r4 shipped the split as a perf rewrite; the
    r5 on-chip A/B measured it at -6.7% img/s and reverted to the fold —
    PERF.md dead-end table — so the fold is now the shipping form and
    the split is the oracle.)"""
    from ust_run_tpu.semisup.step import make_step_parts
    from ust_run_tpu.utils import losses as L

    hp, model, _ = prostate_setup
    step_fn, build_inputs, loss_terms = make_step_parts(model, hp)
    b_lb, b_ulb = hp.label_bs, hp.unlabel_bs

    data = fake_data(hp, seed=11)
    state = create_train_state(model, hp, seed=11)
    # one real step first so the LQ carry is valid and the queue may be
    # non-empty — the 6th (LQ) group's conditional stat fold is exercised
    state, _ = jax.jit(step_fn)(state, data, fake_batch(hp, seed=11))
    inp = jax.jit(build_inputs)(state, data, fake_batch(hp, seed=12))

    # SHIPPED path: the 21-image six-group fold
    (loss_fold, aux_fold), grads_fold = jax.jit(jax.value_and_grad(
        loss_terms, has_aux=True))(state.params, state, inp)

    # ORACLE path: reference-shaped split — grad-free 1-group hardness
    # forward first (train.py:668), then the 17-image 5-group call
    # seeded from its running stats (train.py:699-702, 740)
    def split_form(params):
        stu_w, upd_w = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            inp["ulb_x_w"], train=True, groups=1,
            mutable=["batch_stats"])
        stu_in = jnp.concatenate(
            [inp["lb_x_w"], inp["ulb_x_s_ul"], inp["ulb_x_s_lu"],
             inp["ulb_x_s"], inp["lq_s"]])
        sizes = (b_lb, b_ulb, b_ulb, b_ulb, 1)
        valid5 = jnp.concatenate(
            [jnp.ones((4,), jnp.bool_), jnp.reshape(inp["lq_valid"], (1,))])
        logits, upd = model.apply(
            {"params": params, "batch_stats": upd_w["batch_stats"]},
            stu_in, train=True, group_sizes=sizes, group_valid=valid5,
            mutable=["batch_stats"])
        bounds = [b_lb, b_lb + b_ulb, b_lb + 2 * b_ulb, b_lb + 3 * b_ulb]
        (l_lb, l_ul, l_lu, l_s, _l_lq) = jnp.split(logits, bounds)
        sup = L.ce_plus_dice(l_lb, inp["lb_mask"], multilabel=hp.multilabel,
                             n_classes=hp.num_classes)
        ul = L.ce_plus_dice(l_ul, inp["pseudo_label_ul"],
                            multilabel=hp.multilabel,
                            n_classes=hp.num_classes, mask=inp["mask_ul"])
        lu = L.ce_plus_dice(l_lu, inp["pseudo_label_lu"],
                            multilabel=hp.multilabel,
                            n_classes=hp.num_classes, mask=inp["mask_lu"])
        s_ = L.ce_plus_dice(l_s, inp["pseudo_label_w"],
                            multilabel=hp.multilabel,
                            n_classes=hp.num_classes, mask=inp["mask_w"])
        cw = inp["cons_w"]
        total = sup + cw * (ul + lu + cw * s_)
        return total, (upd["batch_stats"],
                       jax.lax.stop_gradient(stu_w))

    (loss_split, (bs_split, stu_w_split)), grads_split = jax.jit(
        jax.value_and_grad(split_form, has_aux=True))(state.params)

    # hardness logits: group 0 of the fold == the split 1-group call
    np.testing.assert_allclose(np.asarray(aux_fold["stu_logits_w"]),
                               np.asarray(stu_w_split),
                               rtol=2e-5, atol=2e-5)
    # loss identical
    np.testing.assert_allclose(float(loss_fold), float(loss_split),
                               rtol=1e-6, atol=0)
    # final running stats identical: closed-form 6-group fold ==
    # sequential [w] -> [lb,ul,lu,s,lq]
    fn = jax.tree_util.tree_leaves_with_path(aux_fold["new_bs"])
    fo = {jax.tree_util.keystr(p): v
          for p, v in jax.tree_util.tree_leaves_with_path(bs_split)}
    assert fn and len(fn) == len(fo)
    for path, v in fn:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(fo[jax.tree_util.keystr(path)]),
            rtol=2e-5, atol=2e-6, err_msg=jax.tree_util.keystr(path))
    # grads identical: the fold's group-0 cotangent is structurally
    # zero, so folding those 4 images into the differentiated call must
    # not move any gradient
    gn = jax.tree_util.tree_leaves_with_path(grads_fold)
    go = {jax.tree_util.keystr(p): v
          for p, v in jax.tree_util.tree_leaves_with_path(grads_split)}
    assert gn and len(gn) == len(go)
    for path, v in gn:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(go[jax.tree_util.keystr(path)]),
            rtol=5e-5, atol=5e-6, err_msg=jax.tree_util.keystr(path))
