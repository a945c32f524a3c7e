"""The UST-RUN training algorithm as one fused, jitted XLA step.

This replaces the reference hot loop body (train.py:577-858): per
iteration the reference runs CPU PIL augmentations in worker processes,
a numpy-FFT FDA round trip (GPU->CPU->GPU, train.py:629-636), 3 teacher +
5-6 student U-Net forwards as separate kernel launches, per-sample dice on
host numpy (train.py:705-807), python queue bookkeeping, backward, EMA and
LR updates. Here ALL of it — augmentation, FDA, CutMix, batched teacher
(one 3-group call) and student (one 21-image six-group call incl. the
1-image LQ group) forwards, loss, SGD update, EMA, curriculum state
transition — compiles into a single XLA executable with zero host
synchronization.

Round-5 note: r4's end-of-round snapshot split the grad-free hardness
forward (train.py:668) out of the differentiated call, arguing ~19% of
backward conv/BN work carried structurally-zero cotangents. The on-chip
A/B (PERF.md dead-end table) measured the split at −6.7% images/s: the
extra 4-image pass batches worse than the zero-cotangent backward costs,
and the 1-group call serializes against the 17-image call through its
running-stat handoff. Reverted to the single fold; the split/fold
equivalence (loss, grads, stats) is pinned by
tests/test_train_step.py::test_hardness_fold_matches_split.

Algorithm parity notes are inline, keyed to train.py line numbers.
"""

import dataclasses

import jax
import jax.numpy as jnp
import optax

from ust_run_tpu.ops import augment, cutmix, fda
from ust_run_tpu.semisup.state import CurriculumQueue, LQCarry, make_optimizer
from ust_run_tpu.utils import losses as L
from ust_run_tpu.utils import metrics as M
from ust_run_tpu.utils import ramps


@dataclasses.dataclass(frozen=True)
class HyperParams:
    """Static (trace-time) configuration of the train step."""
    dataset: str
    patch: int
    channels: int
    num_classes: int
    multilabel: bool
    n_part: int
    label_bs: int
    unlabel_bs: int
    queue_len: int
    domain_num: int
    threshold: float
    cutmix_prob: float
    LB: float
    increase: float
    consistency: float
    consistency_rampup: float
    max_iterations: int
    ema_decay: float
    base_lr: float
    min_v: float
    max_v: float
    fillcolor: int
    blur_radius: int
    # Include the LQ sample in the unsup_ul loss. In the reference this
    # branch is DEAD CODE: `logits_ul_lq` is assigned None once
    # (train.py:743) and the reassignment that would arm it sits inside
    # the `if logits_ul_lq is not None:` gate (train.py:822-823), which
    # therefore never fires. Only the BN side-effect of model(lq_s)
    # (train.py:741) reaches the trained model. Default False =
    # reference-faithful; True applies the term (the paper's apparent
    # intent) as an explicit opt-in.
    lq_loss: bool = False

    @classmethod
    def from_config(cls, cfg):
        p = cfg.profile()
        return cls(
            dataset=cfg.dataset, patch=p.patch_size, channels=p.num_channels,
            num_classes=p.num_classes, multilabel=p.multilabel,
            n_part=p.n_part, label_bs=cfg.label_bs, unlabel_bs=cfg.unlabel_bs,
            queue_len=cfg.queue_len, domain_num=cfg.domain_num,
            threshold=cfg.threshold, cutmix_prob=cfg.cutmix_prob, LB=cfg.LB,
            increase=cfg.increase, consistency=cfg.consistency,
            consistency_rampup=cfg.consistency_rampup,
            max_iterations=cfg.max_iterations, ema_decay=cfg.ema_decay,
            base_lr=cfg.base_lr, min_v=p.min_v, max_v=p.max_v,
            fillcolor=p.fillcolor,
            blur_radius=augment.blur_radius_for(p.patch_size),
            lq_loss=getattr(cfg, "lq_consistency", False))


def decode_mask(labels, dataset):
    """Raw (B,S,S,K) uint8-valued label maps -> training targets.

    fundus:   cup = label==0, disc = label<=128 -> (B,S,S,2) f32
              (train.py:590-596)
    prostate: label==0 -> (B,S,S) i32            (train.py:599-601)
    BUSI:     label==255 -> (B,S,S) i32          (train.py:604-606)
    MNMS:     3-channel one-hot-by-255 -> classes 1..3, later channels win
              (train_mnms.py:549-556)
    """
    if dataset == "fundus":
        lab = labels[..., 0]
        return jnp.stack([(lab == 0), (lab <= 128)], axis=-1).astype(
            jnp.float32)
    if dataset == "prostate":
        return (labels[..., 0] == 0).astype(jnp.int32)
    if dataset == "BUSI":
        return (labels[..., 0] == 255).astype(jnp.int32)
    if dataset == "MNMS":
        m = jnp.where(labels[..., 0] == 255, 1, 0)
        m = jnp.where(labels[..., 1] == 255, 2, m)
        m = jnp.where(labels[..., 2] == 255, 3, m)
        return m.astype(jnp.int32)
    raise ValueError(dataset)


def _pseudo_from_logits(logits, hp):
    """Teacher outputs -> (pseudo_label, conf_mask) (train.py:648-667).

    fundus: sigmoid; pl = p>=0.5; mask = (p>=thr)+(p<=1-thr), per channel.
    else:   softmax; pl = argmax; mask = (maxprob > thr) as (B,S,S,1).
    """
    if hp.multilabel:
        prob = jax.nn.sigmoid(logits)
        pl = (prob >= 0.5).astype(jnp.float32)
        mask = (prob >= hp.threshold).astype(jnp.float32) \
            + (prob <= 1 - hp.threshold).astype(jnp.float32)
        return pl, mask
    prob = jax.nn.softmax(logits, axis=-1)
    conf = jnp.max(prob, axis=-1)
    pl = jnp.argmax(prob, axis=-1).astype(jnp.int32)
    mask = (conf > hp.threshold).astype(jnp.float32)[..., None]
    return pl, mask


def _mix_labels(a, b, box, hp):
    """pl_out = a*(1-box) + b*box with dtype handling (train.py:679,690,693).
    box: (B,S,S) {0,1} float."""
    if hp.multilabel:
        box = box[..., None]
        return a * (1 - box) + b * box
    return jnp.where(box > 0, b, a).astype(jnp.int32)


def _part_dice(pl, target, hp):
    """Per-sample mean-over-parts dice between two label maps, the hardness
    measure (train.py:705-710). Returns (B,)."""
    if hp.multilabel:
        d = M.dice_per_part_jax(pl, target, hp.n_part)
    else:
        if hp.n_part == 1:
            d = M.dice_per_part_jax(pl == 1, target == 1, 1)
        else:
            d = M.dice_per_part_jax(pl, target, hp.n_part)
    return jnp.mean(d, axis=0)


def _tree_select(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def metric_spec(hp):
    """Static layout of the packed per-step metric vector. Packing all
    diagnostics into ONE f32 array means the host fetches one buffer per
    step instead of ~25 (each fetch is a full RTT on a tunneled TPU)."""
    p, d = hp.n_part, hp.domain_num
    return [
        ("loss", 1), ("sup_loss", 1), ("unsup_loss_ul", 1),
        ("unsup_loss_lu", 1), ("unsup_loss_s", 1),
        ("consistency_weight", 1), ("mask_ratio", 1),
        ("ratio_before_ensemble", 1), ("ratio_after_ensemble", 1),
        ("ulb_dice", p), ("lq_dice", p), ("hardness_mean", 1),
        ("cur_simple_num", 1), ("queue_count", 1), ("choice_th", 1),
        ("lr", 1), ("cur_simple_dice", p), ("other_ulb_dice", p),
        ("queue_dice", p), ("simple_dc_counts", d), ("simple_hardness", 1),
        ("simple_flags", hp.unlabel_bs),
    ]


def pack_metrics(metrics, hp):
    parts = []
    for name, n in metric_spec(hp):
        parts.append(jnp.asarray(metrics[name], jnp.float32).reshape(n))
    return jnp.concatenate(parts)


_VECTOR_METRICS = frozenset([
    "ulb_dice", "lq_dice", "cur_simple_dice", "other_ulb_dice",
    "queue_dice", "simple_dc_counts", "simple_flags"])


def unpack_metrics(vec, hp):
    """vec: fetched numpy array -> dict; per-part/per-domain metrics stay
    1-D vectors (even when length 1), true scalars come back 0-d."""
    import numpy as np
    out = {}
    i = 0
    for name, n in metric_spec(hp):
        if name in _VECTOR_METRICS:
            out[name] = np.asarray(vec[i:i + n])
        else:
            out[name] = np.asarray(vec[i])
        i += n
    return out


def make_step_parts(model, hp: HyperParams, mesh=None):
    """Build the train step plus its two separable stages.

    Returns (step_fn, build_inputs, loss_terms):
      * step_fn(state, data, idx) -> (state, packed metrics) — the fused
        step, exactly as jitted by make_train_step;
      * build_inputs(state, data, idx) -> dict — everything the loss
        consumes (augmented/mixed student inputs, pseudo-labels, masks,
        consistency weight) plus the curriculum byproducts, reproducing
        the step's own RNG stream. Forensics tools (tools/event_hunt.py,
        tools/nan_replay.py) use this to decompose a recorded step
        without re-implementing the input pipeline;
      * loss_terms(params, state, inp) -> (total, aux) — the loss the
        step differentiates, on those inputs.

    `data` is the ENTIRE decoded training corpus, resident in device HBM
    (uint8: lb_img (N1,S,S,C), lb_lab (N1,S,S,K), lb_dc (N1,), ulb_*
    likewise — a few hundred MB at most). `idx` carries just the sampled
    indices {'lb_idx': (B,), 'ulb_idx': (B,)}. The host therefore ships a
    handful of int32s per step instead of ~2MB of pixels — on a tunneled
    TPU the pixel transfer would otherwise dominate the step (profiled:
    ~36ms device compute vs ~130ms wall including infeed).

    With a mesh: state/data replicated; batch tensors are constrained to
    the "data" axis right after the on-device gather; conv inputs are
    additionally constrained over "space" when the mesh has a spatial axis
    (GSPMD inserts conv halo exchanges).
    """
    from ust_run_tpu.parallel.mesh import spatial_constraint
    constrain = spatial_constraint(mesh)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        bsh = NamedSharding(mesh, P("data"))

        def bconstrain(x):
            return jax.lax.with_sharding_constraint(x, bsh)
    else:
        def bconstrain(x):
            return x
    tx = make_optimizer(hp.base_lr, hp.max_iterations)
    b_lb, b_ulb, q = hp.label_bs, hp.unlabel_bs, hp.queue_len
    s = hp.patch

    def build_inputs(state, data, idx):
        rngs = jax.random.split(state.rng, 10)
        (rng_next, k_weak_lb, k_weak_ulb, k_strong, k_choice, k_fda, k_box,
         k_lq, k_perm, k_misc) = rngs

        # ------ on-device batch assembly from the HBM-resident corpus ----
        lb_idx = idx["lb_idx"]
        ulb_idx = idx["ulb_idx"]
        batch = {
            "lb_img": bconstrain(data["lb_img"][lb_idx]),
            "lb_lab": bconstrain(data["lb_lab"][lb_idx]),
            "ulb_img": bconstrain(data["ulb_img"][ulb_idx]),
            "ulb_lab": bconstrain(data["ulb_lab"][ulb_idx]),
            "ulb_dc": data["ulb_dc"][ulb_idx],
        }

        # ------ device-side augmentation (reference: DataLoader workers) --
        # one fused weak pass over [labeled; unlabeled] (one PRNG fill, one
        # smoothing matmul, one patch gather)
        del k_weak_ulb
        # uint8 straight into the aug gathers (converted to f32 only at
        # the interpolation step — identical values, 4x less gather
        # traffic; see resample.bilinear_gather)
        all_img255, all_lab = augment.weak_augment_batch(
            k_weak_lb,
            jnp.concatenate([batch["lb_img"], batch["ulb_img"]]),
            jnp.concatenate([batch["lb_lab"], batch["ulb_lab"]]),
            s, hp.fillcolor)
        lb_img255, ulb_img255 = all_img255[:b_lb], all_img255[b_lb:]
        lb_lab, ulb_lab = all_lab[:b_lb], all_lab[b_lb:]
        ulb_s255 = augment.strong_augment_batch(
            k_strong, ulb_img255, hp.min_v, hp.max_v, hp.blur_radius)

        lb_x_w = augment.normalize(lb_img255)
        ulb_x_w = augment.normalize(ulb_img255)
        ulb_x_s = augment.normalize(ulb_s255)

        lb_mask = decode_mask(lb_lab, hp.dataset)
        ulb_mask = decode_mask(ulb_lab, hp.dataset)
        ulb_dc = batch["ulb_dc"].astype(jnp.int32)

        # ------ cut pool: labeled batch + simple queue (train.py:611-626) --
        queue = state.queue
        cnt = queue.count
        ones_conf = jnp.ones((b_lb,) + queue.conf.shape[1:], jnp.float32)
        pool_img = jnp.concatenate([lb_x_w, queue.img])
        pool_pl = jnp.concatenate([_as_pl(lb_mask, hp), queue.pl])
        pool_conf = jnp.concatenate([ones_conf, queue.conf])

        n_simple = jnp.minimum(b_ulb // 2, cnt)              # train.py:621
        kc1, kc2 = jax.random.split(k_choice)
        lb_choice = jax.random.randint(kc1, (b_ulb,), 0, b_lb)
        q_choice = b_lb + jax.random.randint(
            kc2, (b_ulb,), 0, jnp.maximum(cnt, 1))
        slot_is_q = jax.lax.broadcasted_iota(jnp.int32, (b_ulb, 1), 0)[:, 0] \
            >= (b_ulb - n_simple)
        slot_is_q = jax.random.permutation(k_perm, slot_is_q)  # :625
        choice = jnp.where(slot_is_q, q_choice, lb_choice)

        mix_img = pool_img[choice]
        cut_label_choice = pool_pl[choice]
        cut_mask_choice = pool_conf[choice]

        # ------ FDA restyle toward the unlabeled batch (train.py:629-636) --
        degree = state.step.astype(jnp.float32) / hp.max_iterations
        move255 = fda.fda_batch(k_fda, augment.denormalize(mix_img),
                                ulb_img255, degree, hp.LB)
        move_transx = augment.normalize(move255)

        # ------ cutmix boxes (train.py:639-642) ---------------------------
        label_box = cutmix.cutmix_boxes(k_box, b_ulb, s, hp.cutmix_prob)
        img_box = label_box[..., None]                       # (B,S,S,1)

        # ------ teacher forwards, one 3-group call (train.py:643-647) -----
        ulb_x_w_ul = ulb_x_w * (1 - img_box) + mix_img * img_box
        ulb_x_w_lu = mix_img * (1 - img_box) + ulb_x_w * img_box
        tea_in = constrain(jnp.concatenate([ulb_x_w, ulb_x_w_ul, ulb_x_w_lu]))
        tea_logits, tea_upd = model.apply(
            {"params": state.ema_params,
             "batch_stats": state.ema_batch_stats},
            tea_in, train=True, groups=3, mutable=["batch_stats"])
        logits_w, logits_w_ul, logits_w_lu = jnp.split(tea_logits, 3)
        pseudo_label, mask = _pseudo_from_logits(logits_w, hp)
        pl_w_ul, mask_w_ul = _pseudo_from_logits(logits_w_ul, hp)
        pl_w_lu, mask_w_lu = _pseudo_from_logits(logits_w_lu, hp)

        # ------ bidirectional ensemble (train.py:677-686) -----------------
        mask_w = mask_w_ul * (1 - img_box) + mask_w_lu * img_box
        ratio_before = jnp.mean(mask_w)
        pseudo_label_w = _mix_labels(pl_w_ul, pl_w_lu, label_box, hp)
        if hp.multilabel:
            ensemble = (pseudo_label_w == pseudo_label).astype(jnp.float32) \
                * mask
        else:
            ensemble = (pseudo_label_w == pseudo_label).astype(
                jnp.float32)[..., None] * mask
        mask_w = jnp.where(ensemble == 0, 0.0, mask_w)
        ratio_after = jnp.mean(mask_w)

        # ------ student mixed inputs (train.py:688-697) -------------------
        mask_ul = jnp.where(img_box > 0, cut_mask_choice, mask)
        mask_lu = jnp.where(img_box > 0, mask, cut_mask_choice)
        ulb_x_s_ul = ulb_x_s * (1 - img_box) + move_transx * img_box
        ulb_x_s_lu = move_transx * (1 - img_box) + ulb_x_s * img_box
        pseudo_label_ul = _mix_labels(pseudo_label, cut_label_choice,
                                      label_box, hp)
        pseudo_label_lu = _mix_labels(cut_label_choice, pseudo_label,
                                      label_box, hp)

        # ------ LQ composite from the PREVIOUS iteration (train.py:720-743)
        lq = state.lq
        klq1, klq2 = jax.random.split(k_lq)
        new_choice = jax.random.randint(klq1, (), 0, b_lb)
        if hp.multilabel:
            region = jnp.maximum(lq.pl[0, ..., 1], lq.pl[0, ..., 0])
            region = jnp.maximum(region, lb_mask[new_choice, ..., 0])
            region = jnp.maximum(region, lb_mask[new_choice, ..., 1])
        else:
            region = jnp.maximum((lq.pl[0] > 0).astype(jnp.float32),
                                 (lb_mask[new_choice] > 0).astype(jnp.float32))
        label_box_lq = cutmix.all_cover_box(klq2, region)[None]  # (1,S,S)
        img_box_lq = label_box_lq[..., None]
        lq_s = lq.img * (1 - img_box_lq) + lb_x_w[new_choice][None] * img_box_lq
        pseudo_label_lq = _mix_labels(lq.pl, _as_pl(lb_mask, hp)[new_choice][None],
                                      label_box_lq, hp)
        mask_lq = jnp.where(img_box_lq > 0, 1.0, lq.conf)

        # ------ consistency weight (train.py:819-820) ---------------------
        cons_w = ramps.consistency_weight(
            hp.consistency, state.step.astype(jnp.float32),
            hp.max_iterations, hp.consistency_rampup)

        return dict(
            rng_next=rng_next,
            lb_x_w=lb_x_w, ulb_x_w=ulb_x_w, ulb_x_s=ulb_x_s,
            ulb_x_s_ul=ulb_x_s_ul, ulb_x_s_lu=ulb_x_s_lu, lq_s=lq_s,
            lb_mask=lb_mask, ulb_mask=ulb_mask, ulb_dc=ulb_dc,
            pseudo_label=pseudo_label, mask=mask,
            pseudo_label_ul=pseudo_label_ul, mask_ul=mask_ul,
            pseudo_label_lu=pseudo_label_lu, mask_lu=mask_lu,
            pseudo_label_w=pseudo_label_w, mask_w=mask_w,
            pseudo_label_lq=pseudo_label_lq, mask_lq=mask_lq,
            lq_valid=lq.valid, cons_w=cons_w,
            ratio_before=ratio_before, ratio_after=ratio_after,
            tea_batch_stats=tea_upd["batch_stats"],
        )

    # ------ student forwards + loss (train.py:668-674, 699-702,
    #         740, 816-838) -----------------------------------------------
    def loss_terms(params, state, inp):
        # ONE 21-image call: the five B=4 student passes plus the B=1
        # LQ pass (train.py:699-702, 740) as six BN groups of a single
        # conv stack. Folding the LQ sample in removes the serial
        # batch-1 conv chain that used to follow the grouped call
        # (r2 VERDICT weak #2); `group_valid` makes its running-stat
        # contribution conditional on lq.valid, exactly like the
        # separate forward it replaces.
        stu_in = constrain(jnp.concatenate(
            [inp["ulb_x_w"], inp["lb_x_w"], inp["ulb_x_s_ul"],
             inp["ulb_x_s_lu"], inp["ulb_x_s"], inp["lq_s"]]))
        sizes = (b_ulb, b_lb, b_ulb, b_ulb, b_ulb, 1)
        valid6 = jnp.concatenate(
            [jnp.ones((5,), jnp.bool_), jnp.reshape(inp["lq_valid"], (1,))])
        logits_a, upd_a = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            stu_in, train=True, group_sizes=sizes, group_valid=valid6,
            mutable=["batch_stats"])
        bounds = [b_ulb, b_ulb + b_lb, 2 * b_ulb + b_lb,
                  3 * b_ulb + b_lb, 4 * b_ulb + b_lb]
        (stu_logits_w, logits_lb, logits_ul, logits_lu,
         logits_s, logits_lq) = jnp.split(logits_a, bounds)
        new_bs = upd_a["batch_stats"]
        cons_w = inp["cons_w"]

        sup_loss = L.ce_plus_dice(logits_lb, inp["lb_mask"],
                                  multilabel=hp.multilabel,
                                  n_classes=hp.num_classes)
        ul_without = L.ce_plus_dice(
            logits_ul, inp["pseudo_label_ul"], multilabel=hp.multilabel,
            n_classes=hp.num_classes, mask=inp["mask_ul"])
        if hp.lq_loss:
            # opt-in: LQ sample concatenated into unsup_ul when valid
            # (the branch at train.py:822-830 as written; dead upstream
            # — see HyperParams.lq_loss). The CE mean denominator
            # includes the extra sample, matching the torch.cat form.
            ul_with = L.ce_plus_dice(
                jnp.concatenate([logits_ul, logits_lq]),
                jnp.concatenate([inp["pseudo_label_ul"],
                                 inp["pseudo_label_lq"]]),
                multilabel=hp.multilabel, n_classes=hp.num_classes,
                mask=jnp.concatenate([inp["mask_ul"], inp["mask_lq"]]))
            unsup_ul = jnp.where(inp["lq_valid"], ul_with, ul_without)
        else:
            # reference-faithful: only the BN side-effect of the
            # model(lq_s) forward (train.py:741) survives; the
            # forward above still threads its batch_stats update.
            del logits_lq
            unsup_ul = ul_without
        unsup_lu = L.ce_plus_dice(
            logits_lu, inp["pseudo_label_lu"], multilabel=hp.multilabel,
            n_classes=hp.num_classes, mask=inp["mask_lu"])
        unsup_s = L.ce_plus_dice(
            logits_s, inp["pseudo_label_w"], multilabel=hp.multilabel,
            n_classes=hp.num_classes, mask=inp["mask_w"])
        total = sup_loss + cons_w * (unsup_ul + unsup_lu
                                     + cons_w * unsup_s)  # :838
        aux = dict(new_bs=new_bs, stu_logits_w=stu_logits_w,
                   sup_loss=sup_loss, unsup_ul=unsup_ul,
                   unsup_lu=unsup_lu, unsup_s=unsup_s)
        return total, aux

    def step_fn(state, data, idx):
        inp = build_inputs(state, data, idx)
        (loss, aux), grads = jax.value_and_grad(
            loss_terms, has_aux=True)(state.params, state, inp)
        (pseudo_label, mask, ulb_x_w, ulb_mask, ulb_dc, cons_w) = (
            inp["pseudo_label"], inp["mask"], inp["ulb_x_w"],
            inp["ulb_mask"], inp["ulb_dc"], inp["cons_w"])
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # ------ EMA (train.py:87-93, 851): called with pre-increment step -
        alpha = jnp.minimum(1.0 - 1.0 / (state.step.astype(jnp.float32) + 1),
                            hp.ema_decay)
        new_ema = jax.tree.map(lambda e, p: alpha * e + (1 - alpha) * p,
                               state.ema_params, new_params)

        # ------ hardness + curriculum update (train.py:705-814) -----------
        stu_pl, _ = _pseudo_from_logits(
            jax.lax.stop_gradient(aux["stu_logits_w"]), hp)
        hardness = 1.0 - _part_dice(stu_pl, pseudo_label, hp)   # (B,)
        hardness = jnp.where(state.epoch == 0,
                             jnp.ones_like(hardness), hardness)  # :711-713
        lq_idx = jnp.argmax(hardness)                            # :714-718

        new_lq = LQCarry(
            img=ulb_x_w[lq_idx][None], pl=_index_pl(pseudo_label, lq_idx),
            conf=mask[lq_idx][None], valid=jnp.asarray(True))   # :749-751

        new_queue, new_th, qmetrics = _update_queue(
            state.queue, state.choice_th, hardness, ulb_x_w, pseudo_label,
            ulb_mask, mask, ulb_dc, hp)

        # ------ per-step diagnostics (train.py:745-814, 859-870) ----------
        simple_idx = hardness < state.choice_th
        ulb_dice = _part_dice_parts(pseudo_label, ulb_mask, hp)
        lq_dice = _part_dice_parts(
            _index_pl(pseudo_label, lq_idx), _index_pl(ulb_mask, lq_idx), hp)
        metrics = dict(
            loss=loss, sup_loss=aux["sup_loss"], unsup_loss_ul=aux["unsup_ul"],
            unsup_loss_lu=aux["unsup_lu"], unsup_loss_s=aux["unsup_s"],
            consistency_weight=cons_w, mask_ratio=jnp.mean(mask),
            ratio_before_ensemble=inp["ratio_before"],
            ratio_after_ensemble=inp["ratio_after"],
            ulb_dice=jnp.mean(ulb_dice, axis=1),          # (n_part,)
            lq_dice=jnp.mean(lq_dice, axis=1),
            hardness_mean=jnp.mean(hardness),
            cur_simple_num=jnp.sum(simple_idx.astype(jnp.int32)),
            simple_flags=simple_idx.astype(jnp.float32),
            queue_count=new_queue.count,
            choice_th=new_th,
            lr=tx_lr(state.step, hp),
            **qmetrics,
        )

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=aux["new_bs"],
            ema_params=new_ema,
            ema_batch_stats=inp["tea_batch_stats"],
            opt_state=new_opt,
            rng=inp["rng_next"],
            queue=new_queue,
            lq=new_lq,
            choice_th=new_th,
        )
        return new_state, pack_metrics(metrics, hp)

    def _as_pl(mask, hp_=hp):
        # labeled ground-truth masks double as pseudo-labels in the cut
        # pool (train.py:614, 619); identical representation here.
        del hp_
        return mask

    def _index_pl(pl, idx):
        return pl[idx][None]

    def _part_dice_parts(pl, target, hp_):
        """(n_part, B) per-sample dice between label maps."""
        if hp_.multilabel:
            return M.dice_per_part_jax(pl, target, hp_.n_part)
        if hp_.n_part == 1:
            return M.dice_per_part_jax(pl == 1, target == 1, 1)
        return M.dice_per_part_jax(pl, target, hp_.n_part)

    def tx_lr(step, hp_):
        eff = jnp.maximum(step.astype(jnp.float32) - 1, 0)
        return hp_.base_lr * (1.0 - eff / hp_.max_iterations) ** 0.9

    def _update_queue(queue, choice_th, hardness, ulb_x_w, pseudo_label,
                      ulb_mask, mask, ulb_dc, hp_):
        """Fixed-shape transcription of the queue transition
        (train.py:754-807)."""
        cnt = queue.count
        was_empty = cnt == 0
        simple_idx = hardness < choice_th                     # :754
        cur_n = jnp.sum(simple_idx.astype(jnp.int32))

        total = b_ulb + q
        cand_valid = jnp.concatenate([simple_idx, queue.valid])
        order = jax.lax.broadcasted_iota(jnp.int32, (total, 1), 0)[:, 0]
        sort_key = order + total * (1 - cand_valid.astype(jnp.int32))
        perm = jnp.argsort(sort_key)[:q]  # valid-first, order-stable, trunc

        def gather(new, old):
            return jnp.concatenate([new, old])[perm]

        cand = CurriculumQueue(
            img=gather(ulb_x_w, queue.img),
            pl=gather(pseudo_label, queue.pl),
            gt=gather(ulb_mask, queue.gt),
            conf=gather(mask, queue.conf),
            hardness=gather(hardness, queue.hardness),
            dc=gather(ulb_dc, queue.dc),
            valid=jax.lax.broadcasted_iota(jnp.int32, (q, 1), 0)[:, 0]
            < jnp.minimum(cur_n + cnt, q),
        )
        do_refresh = cur_n > 0
        new_queue = _tree_select(do_refresh, cand, queue)

        # choice_th transition (train.py:763-779): refresh -> clamp to the
        # max hardness in the new buffer; stagnant non-empty -> geometric
        # increase capped at 0.1; empty-and-nothing-new -> unchanged.
        buf_max = jnp.max(jnp.where(cand.valid, cand.hardness, -jnp.inf))
        th_refresh = jnp.minimum(choice_th, buf_max)
        th_increase = jnp.minimum(hp_.increase * choice_th, 0.1)
        new_th = jnp.where(do_refresh, th_refresh,
                           jnp.where(was_empty, choice_th, th_increase))

        # epoch diagnostics (train.py:783-814)
        sim_f = simple_idx.astype(jnp.float32)
        cur_dice = _part_dice_parts(pseudo_label, ulb_mask, hp_)  # (P,B)
        cur_simple_dice = jnp.sum(cur_dice * sim_f, axis=1) \
            / jnp.maximum(jnp.sum(sim_f), 1)
        other_f = 1.0 - sim_f
        other_dice = jnp.sum(cur_dice * other_f, axis=1) \
            / jnp.maximum(jnp.sum(other_f), 1)
        qd = _part_dice_parts(new_queue.pl, new_queue.gt, hp_)    # (P,Q)
        qv = new_queue.valid.astype(jnp.float32)
        queue_dice = jnp.where(
            jnp.sum(qv) > 0,
            jnp.sum(qd * qv, axis=1) / jnp.maximum(jnp.sum(qv), 1),
            -jnp.ones((hp_.n_part,)))
        dc_onehot = jax.nn.one_hot(ulb_dc - 1, hp_.domain_num)
        dc_counts = jnp.sum(dc_onehot * sim_f[:, None], axis=0)
        simple_hardness = jnp.sum(hardness * sim_f) \
            / jnp.maximum(jnp.sum(sim_f), 1)
        qmetrics = dict(cur_simple_dice=cur_simple_dice,
                        other_ulb_dice=other_dice,
                        queue_dice=queue_dice,
                        simple_dc_counts=dc_counts,
                        simple_hardness=simple_hardness)
        return new_queue, new_th, qmetrics

    return step_fn, build_inputs, loss_terms


def make_step_fn(model, hp: HyperParams, mesh=None):
    """The fused train step alone (see make_step_parts)."""
    return make_step_parts(model, hp, mesh)[0]


def _jit_kwargs(repl_sharding):
    if repl_sharding is None:
        return {}
    # state, corpus and index batches are all replicated; the step itself
    # constrains batch tensors onto the "data"/"space" axes.
    return dict(in_shardings=(repl_sharding, repl_sharding, repl_sharding),
                out_shardings=(repl_sharding, repl_sharding))


def make_train_step(model, hp: HyperParams, mesh=None,
                    data_sharding=None, repl_sharding=None):
    """Jitted single step: step(state, data, idx) -> (state, metrics)."""
    del data_sharding
    step_fn = make_step_fn(model, hp, mesh)
    return jax.jit(step_fn, donate_argnums=(0,),
                   **_jit_kwargs(repl_sharding))


def make_train_multi_step(model, hp: HyperParams, mesh=None,
                          data_sharding=None, repl_sharding=None):
    """K steps per dispatch via lax.scan.

    On a tunneled/remote TPU every python->device call costs a full RTT;
    scanning K index batches (stacked on a leading axis) through the step
    amortizes dispatch and metric-fetch overhead by K. Returns
    multi(state, data, idxs) -> (state, metrics (K, M)).
    """
    del data_sharding
    step_fn = make_step_fn(model, hp, mesh)

    def multi(state, data, idxs):
        return jax.lax.scan(lambda s, ix: step_fn(s, data, ix), state, idxs)

    return jax.jit(multi, donate_argnums=(0,), **_jit_kwargs(repl_sharding))
