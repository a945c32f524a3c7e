"""The training driver: epoch loop, evaluation scheduling, checkpointing.

Capability parity with reference train() (train.py:400-961 /
train_mnms.py:393-877). The hot loop itself is the fused jitted step
(semisup/step.py); this module owns everything around it:

  * dataset/loader construction with the reference's split semantics
    (train.py:464-494);
  * the epoch structure: num_eval_iter steps per epoch, LQ reset at epoch
    start (train.py:576), epoch-end curriculum summaries
    (train.py:888-907);
  * EMA + student evaluation every epoch with best-dice tracking and the
    best-student snapshot (train.py:913-954);
  * rolling checkpoint + resume (train.py:542-548, 955-958);
  * scalar logging with the reference's tag names (train.py:859-870).

Metrics are fetched with one-step lag so the host never blocks the device
pipeline.
"""

import logging
import os
import sys
import time

import jax
import numpy as np

from ust_run_tpu.config import TrainConfig
from ust_run_tpu.data.datasets import SegmentationDataset
from ust_run_tpu.data.pipeline import BatchPipeline, TestLoader
from ust_run_tpu.engine import checkpoint as ckpt
from ust_run_tpu.engine.evaluator import Evaluator
from ust_run_tpu.models import UNet
from ust_run_tpu.parallel import (batch_sharding, make_mesh,
                                  replicated_sharding)
from ust_run_tpu.semisup import (HyperParams, create_train_state,
                                 make_train_step)
from ust_run_tpu.semisup.state import reset_epoch
from ust_run_tpu.semisup.step import unpack_metrics
from ust_run_tpu.utils.logging_utils import MetricWriter
from ust_run_tpu.utils.meters import AverageMeter


def build_model(cfg: TrainConfig, dtype=None):
    """Model zoo dispatch. The reference trains `unet`
    (networks/unet_model.py via train.py:496-506); the other families are
    available for backbone-swap experiments (BASELINE.json configs)."""
    p = cfg.profile()
    import jax.numpy as jnp
    model_dtype = jnp.bfloat16 if (cfg.amp and dtype is None) else dtype
    if cfg.model == "unet":
        return UNet(n_channels=p.num_channels, n_classes=p.num_classes,
                    dtype=model_dtype, pack_l1=bool(cfg.pack_l1),
                    split_up=bool(getattr(cfg, "split_up", 1)))
    if cfg.model == "unet2d":
        from ust_run_tpu.models import Unet2D
        return Unet2D(c=p.num_channels, num_classes=p.num_classes)
    if cfg.model == "unet2d_dsbn":
        from ust_run_tpu.models import Unet2D
        return Unet2D(c=p.num_channels, num_classes=p.num_classes,
                      norm="dsbn", num_domains=cfg.domain_num)
    if cfg.model == "deeplabv2":
        from ust_run_tpu.models import DeepLabV2
        return DeepLabV2(backbone="resnet101", nclass=p.num_classes)
    if cfg.model == "deeplabv2_r50":
        from ust_run_tpu.models import DeepLabV2
        return DeepLabV2(backbone="resnet50", nclass=p.num_classes)
    raise ValueError(f"unknown model {cfg.model!r}")


class Trainer:
    def __init__(self, cfg: TrainConfig, snapshot_path, use_mesh=True):
        self.cfg = cfg
        self.snapshot_path = snapshot_path
        p = cfg.profile()
        self.profile_ = p
        self.hp = HyperParams.from_config(cfg)
        self.model = build_model(cfg)

        lb_num = cfg.labeled_count()
        data_num = p.domain_len[cfg.lb_domain - 1]
        domains = list(range(1, cfg.domain_num + 1))
        lb_idxs = list(range(lb_num))                      # train.py:478
        ulb_idxs = list(range(lb_num, data_num))           # train.py:479

        self.lb_ds = SegmentationDataset(cfg.dataset, p, cfg.data_root,
                                         "train", cfg.lb_domain,
                                         [cfg.lb_domain], lb_idxs)
        self.ulb_ds = SegmentationDataset(cfg.dataset, p, cfg.data_root,
                                          "train", cfg.lb_domain, domains,
                                          ulb_idxs)
        self.test_loaders = []
        for i in domains:
            ds = SegmentationDataset(cfg.dataset, p, cfg.data_root, "test",
                                     -1, [i])
            self.test_loaders.append(TestLoader(ds, cfg.eval_batch))

        self.lb_pipe = BatchPipeline(self.lb_ds, cfg.label_bs,
                                     seed=cfg.seed)
        self.ulb_pipe = BatchPipeline(self.ulb_ds, cfg.unlabel_bs,
                                      seed=cfg.seed + 1)

        self.mesh = None
        shardings = {}
        if use_mesh and len(jax.devices()) > 1:
            self.mesh = make_mesh(cfg.num_devices)
            shardings = dict(mesh=self.mesh,
                             data_sharding=batch_sharding(self.mesh),
                             repl_sharding=replicated_sharding(self.mesh))
        # K steps per dispatch (lax.scan) amortizes host round-trips;
        # fall back to single-step when K doesn't divide the epoch length.
        self.unroll = cfg.unroll_steps \
            if cfg.unroll_steps > 1 and \
            cfg.num_eval_iter % cfg.unroll_steps == 0 else 1
        if self.unroll > 1:
            from ust_run_tpu.semisup.step import make_train_multi_step
            self.step_fn = make_train_multi_step(self.model, self.hp,
                                                 **shardings)
        else:
            self.step_fn = make_train_step(self.model, self.hp, **shardings)

        # ship the decoded corpus to device HBM ONCE; steps receive indices
        corpus = {
            "lb_img": self.lb_ds.images, "lb_lab": self.lb_ds.labels,
            "ulb_img": self.ulb_ds.images, "ulb_lab": self.ulb_ds.labels,
            "ulb_dc": self.ulb_ds.dc,
        }
        if self.mesh is not None:
            sh = replicated_sharding(self.mesh)
            self.device_data = {k: jax.device_put(v, sh)
                                for k, v in corpus.items()}
        else:
            self.device_data = {k: jax.device_put(v)
                                for k, v in corpus.items()}
        self.state = create_train_state(self.model, self.hp, cfg.seed)
        if cfg.model.startswith("deeplabv2"):
            self.state = self._load_pretrained_backbone(cfg, self.state)
        self.evaluator = Evaluator(self.model, self.hp, self.test_loaders,
                                   list(p.parts), mesh=self.mesh)
        self.writer = MetricWriter(os.path.join(snapshot_path, "log"))

        # best-dice bookkeeping (train.py:526-535)
        n_part = p.n_part
        self.best_dice = [0.0] * n_part
        self.best_dice_iter = [-1] * n_part
        self.best_avg_dice = 0.0
        self.best_avg_dice_iter = -1
        self.dice_of_best_avg = [0.0] * n_part
        self.stu_best_dice = [0.0] * n_part
        self.stu_best_dice_iter = [-1] * n_part
        self.stu_best_avg_dice = 0.0
        self.stu_best_avg_dice_iter = -1
        self.stu_dice_of_best_avg = [0.0] * n_part
        self.start_epoch = 0
        self._ckpt_io = ckpt.AsyncCheckpointer()

        # Non-finite-loss forensics (failure-detection subsystem, SURVEY §5):
        # UST_NAN_DEBUG=<dir> keeps a rolling host snapshot of the train
        # state every UST_NAN_SNAP iters (default 250) plus the index
        # batches since, and on the first non-finite loss dumps both for
        # deterministic replay (tools/nan_replay.py), then aborts.
        self._nan_dir = os.environ.get("UST_NAN_DEBUG", "")
        self._nan_snap_every = int(os.environ.get("UST_NAN_SNAP", "250"))
        self._nan_state = None       # (iter, host state)
        self._nan_batches = []       # batches applied after the snapshot

        if cfg.load:
            path = os.path.join(self.snapshot_path, "checkpoint.pth")
            payload = ckpt.load_checkpoint(path)
            restored = ckpt.restore_onto(self.state, payload["state"])
            self.state = jax.tree.map(
                lambda t, v: jax.numpy.asarray(v).astype(t.dtype),
                self.state, restored)
            self.start_epoch = payload["epoch"]
            self.best_avg_dice = payload["best_dice"]
            self.best_avg_dice_iter = payload["best_iter"]
            self.stu_best_avg_dice = payload["stu_best_dice"]
            self.stu_best_avg_dice_iter = payload["stu_best_iter"]
            logging.info("Models restored from epoch %d", self.start_epoch)

    @staticmethod
    def _load_pretrained_backbone(cfg, state):
        """ImageNet init for the DeepLab configs: the reference's BaseNet
        constructor loads <pretrained_root>/<arch>.pth into the backbone
        for BOTH the student and the fresh EMA model (base.py:10-12,
        resnet.py:185-190, train.py:496-506). The head stays random."""
        from ust_run_tpu.utils.torch_import import \
            overlay_pretrained_backbone
        arch = "resnet50" if cfg.model.endswith("r50") else "resnet101"
        path = os.path.join(cfg.pretrained_root, f"{arch}.pth")
        if not os.path.exists(path):
            logging.warning(
                "pretrained backbone %s not found; training from random "
                "init (the reference would require this file, "
                "resnet.py:185-190). Set --pretrained_root.", path)
            return state
        stu = overlay_pretrained_backbone(
            {"params": state.params, "batch_stats": state.batch_stats},
            path, arch)
        tea = overlay_pretrained_backbone(
            {"params": state.ema_params,
             "batch_stats": state.ema_batch_stats}, path, arch)
        logging.info("loaded ImageNet backbone weights from %s", path)
        return state.replace(
            params=stu["params"], batch_stats=stu["batch_stats"],
            ema_params=tea["params"], ema_batch_stats=tea["batch_stats"])

    def _next_batch(self):
        return {"lb_idx": self.lb_pipe.next_indices().astype(np.int32),
                "ulb_idx": self.ulb_pipe.next_indices().astype(np.int32)}

    def _next_multi_batch(self):
        """K index batches stacked on a leading scan axis."""
        parts = [self._next_batch() for _ in range(self.unroll)]
        return {k: np.stack([p[k] for p in parts]) for k in parts[0]}

    def train(self):
        cfg = self.cfg
        parts = list(self.profile_.parts)
        n_part = len(parts)
        max_epoch = cfg.max_iterations // cfg.num_eval_iter
        logging.info("%d iterations per epoch", cfg.num_eval_iter)
        logging.info("%d epoch in all.", max_epoch)
        iter_num = self.start_epoch * cfg.num_eval_iter

        for epoch_num in range(self.start_epoch, max_epoch):
            self.state = reset_epoch(self.state, epoch_num)
            avg_hardness = AverageMeter()
            avg_dice = [AverageMeter() for _ in range(n_part)]
            other_avg = [AverageMeter() for _ in range(n_part)]
            all_avg = [AverageMeter() for _ in range(n_part)]
            lq_avg = [AverageMeter() for _ in range(n_part)]
            dc_record = np.zeros(cfg.domain_num)
            simple_ulb_name = {}
            pending = None   # (first_iter, metrics, ulb_idx)
            t0 = time.time()

            meters = (parts, avg_hardness, avg_dice, other_avg, all_avg,
                      lq_avg, dc_record, simple_ulb_name)
            n_dispatch = cfg.num_eval_iter // self.unroll
            # tqdm-style live bar on interactive stdout (train.py:874-879);
            # logs stay interval-based so log.txt is unchanged.
            bar = None
            if sys.stdout.isatty():
                try:
                    from tqdm import tqdm
                    bar = tqdm(total=cfg.num_eval_iter, ncols=80,
                               desc=f"epoch {epoch_num + 1}", leave=False)
                except ImportError:
                    pass
            for i_call in range(1, n_dispatch + 1):
                # profiling subsystem (absent in the reference, SURVEY §5):
                # capture a device trace early in the first epoch.
                if cfg.profile_dir and epoch_num == self.start_epoch:
                    if i_call == 2:
                        jax.profiler.start_trace(cfg.profile_dir)
                    elif i_call == 4:
                        jax.profiler.stop_trace()
                        logging.info("profiler trace written to %s",
                                     cfg.profile_dir)
                if self.unroll > 1:
                    batch = self._next_multi_batch()
                else:
                    batch = self._next_batch()
                if self._nan_dir:
                    if self._nan_state is None or \
                            iter_num - self._nan_state[0] >= \
                            self._nan_snap_every:
                        self._nan_state = (iter_num,
                                           jax.device_get(self.state))
                        self._nan_batches = []
                    self._nan_batches.append(batch)
                self.state, metrics = self.step_fn(self.state,
                                                   self.device_data, batch)
                if pending is not None:
                    self._drain(pending, meters, bar)
                pending = (iter_num + 1, metrics, batch["ulb_idx"])
                iter_num += self.unroll
                if bar is not None:
                    bar.update(self.unroll)
            self._drain(pending, meters, bar)
            if bar is not None:
                bar.close()
            dt = time.time() - t0
            imgs = cfg.num_eval_iter * (cfg.label_bs + cfg.unlabel_bs)
            logging.info("epoch %d: %.1f it/s, %.1f images/s",
                         epoch_num + 1, cfg.num_eval_iter / dt, imgs / dt)

            # epoch-end curriculum summaries (train.py:888-907)
            for i, pn in enumerate(parts):
                logging.info("epoch simple dice avg %s:%f", pn,
                             avg_dice[i].avg)
            for i, pn in enumerate(parts):
                logging.info("epoch other ulb dice avg %s:%f", pn,
                             other_avg[i].avg)
            for i, pn in enumerate(parts):
                logging.info("epoch all ulb dice avg %s:%f", pn,
                             all_avg[i].avg)
            for i, pn in enumerate(parts):
                logging.info("epoch lq ulb dice avg %s:%f", pn, lq_avg[i].avg)
            logging.info("epoch simple hardness avg:%f", avg_hardness.avg)
            logging.info("choice threshold:%f", float(self.state.choice_th))
            logging.info(" ".join(f"{n} {c}"
                                  for n, c in simple_ulb_name.items()))
            for i in range(cfg.domain_num):
                logging.info("epoch simple domain %d cnt: %d", i + 1,
                             int(dc_record[i]))

            if os.environ.get("UST_WNORM_LOG"):
                self._log_weight_health(epoch_num)

            self._evaluate_and_checkpoint(epoch_num, iter_num, parts)

            # Matched-horizon parity lanes: stop cleanly after N iterations
            # WITHOUT touching max_iterations (which the LR poly decay and
            # FDA degree schedules divide by, train.py:523,580) — so a short
            # lane sees the exact schedule of a full-budget run.
            stop_after = int(os.environ.get("UST_STOP_AFTER_ITERS", "0"))
            if stop_after and iter_num >= stop_after:
                logging.info("UST_STOP_AFTER_ITERS=%d reached at iter %d; "
                             "stopping early", stop_after, iter_num)
                break

        self._ckpt_io.wait()
        self.writer.close()

    # ------------------------------------------------------------------
    def _drain(self, pending, meters, bar=None):
        """Fetch one dispatch's packed metrics (K rows for multi-step) and
        feed the per-iteration logging path."""
        it0, metrics, ulb_idx = pending
        arr = np.asarray(metrics)
        if arr.ndim == 1:
            arr = arr[None]
            ulb_idx = ulb_idx[None]
        for j in range(arr.shape[0]):
            if self._nan_dir:
                m = unpack_metrics(arr[j], self.hp)
                bad = [k for k in ("loss", "sup_loss", "unsup_loss_ul",
                                   "unsup_loss_lu", "unsup_loss_s")
                       if not np.isfinite(m[k])]
                if bad:
                    self._nan_dump(it0 + j, bad)
            self._log_step(it0 + j, arr[j], np.asarray(ulb_idx[j]), *meters)
        if bar is not None:
            bar.set_description(self._bar_desc(
                it0 + arr.shape[0] - 1, unpack_metrics(arr[-1], self.hp)),
                refresh=False)

    def _log_weight_health(self, epoch_num):
        """UST_WNORM_LOG=1: per-epoch max|value| of each top-level module's
        params and batch_stats — the forensic signal for the BN-invariant
        weight-growth failure mode (first-layer kernels growing until the
        f32 variance accumulation overflows; see tools/nan_replay.py)."""
        import jax.numpy as jnp

        def mod_max(tree):
            return {k: float(max(jnp.max(jnp.abs(x))
                                 for x in jax.tree.leaves(v)))
                    for k, v in tree.items()}

        pm = mod_max(self.state.params)
        bm = mod_max(self.state.batch_stats)
        logging.info("epoch %d weight health: params max %s",
                     epoch_num + 1,
                     " ".join(f"{k}:{v:.3e}" for k, v in pm.items()))
        logging.info("epoch %d weight health: bn max %s",
                     epoch_num + 1,
                     " ".join(f"{k}:{v:.3e}" for k, v in bm.items()))

    def _nan_dump(self, it, bad_terms):
        """First non-finite loss: dump the last good snapshot + the batch
        stream since it, so tools/nan_replay.py can re-run the divergence
        deterministically, then abort the run."""
        import pickle
        os.makedirs(self._nan_dir, exist_ok=True)
        snap_it, snap = self._nan_state
        with open(os.path.join(self._nan_dir, "state.pkl"), "wb") as f:
            pickle.dump({"iter": snap_it, "state": snap}, f)
        with open(os.path.join(self._nan_dir, "batches.pkl"), "wb") as f:
            pickle.dump({"unroll": self.unroll,
                         "batches": self._nan_batches}, f)
        logging.error(
            "non-finite %s at iteration %d; snapshot of iteration %d and "
            "%d batch dispatches dumped to %s", ",".join(bad_terms), it,
            snap_it, len(self._nan_batches), self._nan_dir)
        self._ckpt_io.wait()
        raise SystemExit(3)

    def _bar_desc(self, it, m):
        """The reference's live tqdm description (train.py:874-879), fed
        from the last drained dispatch (one-dispatch lag so the fetch
        never blocks the device queue)."""
        if self.cfg.dataset == "fundus":
            return ("iteration %d: loss:%.4f,sup_loss:%.4f, "
                    "unsup_loss_ul:%f, unsup_loss_lu:%f, cons_w:%.4f,"
                    "mask_ratio:%.4f,%.4f,%.4f,ulb_cd:%.4f,ulb_dd:%.4f"
                    % (it, m["loss"], m["sup_loss"], m["unsup_loss_ul"],
                       m["unsup_loss_lu"], m["consistency_weight"],
                       m["mask_ratio"], m["ratio_before_ensemble"],
                       m["ratio_after_ensemble"], m["ulb_dice"][0],
                       m["ulb_dice"][-1]))
        return ("iteration %d : loss:%.3f, sup_loss:%.3f, "
                "unsup_loss_ul:%.3f, unsup_loss_lu:%.3f, "
                "unsup_loss_s:%.3f, cons_w:%.3f, "
                "mask_ratio:%.3f,%.4f,%.4f, ulb_dice:%.3f"
                % (it, m["loss"], m["sup_loss"], m["unsup_loss_ul"],
                   m["unsup_loss_lu"], m["unsup_loss_s"],
                   m["consistency_weight"], m["mask_ratio"],
                   m["ratio_before_ensemble"], m["ratio_after_ensemble"],
                   m["ulb_dice"][0]))

    def _log_step(self, it, metrics, ulb_idx, parts, avg_hardness, avg_dice,
                  other_avg, all_avg, lq_avg, dc_record, simple_ulb_name):
        cfg = self.cfg
        m = unpack_metrics(np.asarray(metrics), self.hp)
        cur_n = int(m["cur_simple_num"])
        if cur_n > 0:
            for i in range(len(parts)):
                avg_dice[i].update(float(m["cur_simple_dice"][i]))
            avg_hardness.update(float(m["simple_hardness"]))
            dc_record += m["simple_dc_counts"]
            # per-sample-name queue admission counts (train.py:788-794)
            for i, flag in enumerate(m["simple_flags"]):
                if flag > 0:
                    name = self.ulb_ds.names[int(ulb_idx[i])]
                    simple_ulb_name[name] = simple_ulb_name.get(name, 0) + 1
        if cur_n < cfg.unlabel_bs:
            for i in range(len(parts)):
                other_avg[i].update(float(m["other_ulb_dice"][i]))
        for i in range(len(parts)):
            all_avg[i].update(float(m["ulb_dice"][i]))
            lq_avg[i].update(float(m["lq_dice"][i]))

        if it % cfg.log_interval == 0 or it % cfg.num_eval_iter == 0:
            w = self.writer
            for i, pn in enumerate(parts):
                w.add_scalar(f"train/ulb_{pn}_dice", m["ulb_dice"][i], it)
            w.add_scalar("train/mask", m["mask_ratio"], it)
            w.add_scalar("train/lr", m["lr"], it)
            w.add_scalar("train/loss", m["loss"], it)
            w.add_scalar("train/sup_loss", m["sup_loss"], it)
            w.add_scalar("train/unsup_loss_ul", m["unsup_loss_ul"], it)
            w.add_scalar("train/unsup_loss_lu", m["unsup_loss_lu"], it)
            w.add_scalar("train/unsup_loss_s", m["unsup_loss_s"], it)
            w.add_scalar("train/consistency_weight",
                         m["consistency_weight"], it)
            w.add_scalar("train/bi_consistency_weight",
                         float(m["consistency_weight"]) ** 2, it)
        if it % cfg.num_eval_iter == 0:
            logging.info(
                "iteration %d : loss : %f, sup_loss : %f, unsup_loss_ul : %f,"
                " unsup_loss_lu : %f, unsup_loss_s:%.3f,cons_w : %f,"
                " mask_ratio : %f", it, m["loss"], m["sup_loss"],
                m["unsup_loss_ul"], m["unsup_loss_lu"], m["unsup_loss_s"],
                m["consistency_weight"], m["mask_ratio"])
            for i, pn in enumerate(parts):
                logging.info("cur simple dice avg %s:%f", pn,
                             float(m["queue_dice"][i]))

    # ------------------------------------------------------------------
    def _evaluate_and_checkpoint(self, epoch_num, iter_num, parts,
                                 save=True):
        cfg = self.cfg
        n_part = len(parts)
        logging.info("test ema model")
        val_dice = self.evaluator.run(self.state.ema_params,
                                      self.state.ema_batch_stats,
                                      epoch_num + 1, self.writer, ema=True)
        text = ""
        for i, pn in enumerate(parts):
            if val_dice[i] > self.best_dice[i]:
                self.best_dice[i] = val_dice[i]
                self.best_dice_iter[i] = iter_num
            text += "val_%s_best_dice: %f at %d iter, " % (
                pn, self.best_dice[i], self.best_dice_iter[i])
        if sum(val_dice) / n_part > self.best_avg_dice:
            self.best_avg_dice = sum(val_dice) / n_part
            self.best_avg_dice_iter = iter_num
            self.dice_of_best_avg = list(val_dice)
        text += "val_best_avg_dice: %f at %d iter" % (
            self.best_avg_dice, self.best_avg_dice_iter)
        if n_part > 1:
            for i, pn in enumerate(parts):
                text += ", %s_dice: %f" % (pn, self.dice_of_best_avg[i])
        logging.info(text)

        logging.info("test stu model")
        stu_dice = self.evaluator.run(self.state.params,
                                      self.state.batch_stats,
                                      epoch_num + 1, self.writer, ema=False)
        text = ""
        for i, pn in enumerate(parts):
            if stu_dice[i] > self.stu_best_dice[i]:
                self.stu_best_dice[i] = stu_dice[i]
                self.stu_best_dice_iter[i] = iter_num
            text += "stu_val_%s_best_dice: %f at %d iter, " % (
                pn, self.stu_best_dice[i], self.stu_best_dice_iter[i])
        is_best = sum(stu_dice) / n_part > self.stu_best_avg_dice
        if is_best:
            self.stu_best_avg_dice = sum(stu_dice) / n_part
            self.stu_best_avg_dice_iter = iter_num
            self.stu_dice_of_best_avg = list(stu_dice)
        text += "val_best_avg_dice: %f at %d iter" % (
            self.stu_best_avg_dice, self.stu_best_avg_dice_iter)
        if n_part > 1:
            for i, pn in enumerate(parts):
                text += ", %s_dice: %f" % (pn, self.stu_dice_of_best_avg[i])
        logging.info(text)

        if not save:     # --eval mode: report only, never touch artifacts
            return
        # checkpoint I/O runs on a worker thread against device-side copies
        # so the next epoch's training overlaps the ~400MB host fetch
        path = os.path.join(self.snapshot_path, "checkpoint.pth")
        state_copy = ckpt.device_copy(self.state)
        save_best = os.path.join(self.snapshot_path,
                                 f"{cfg.model}_avg_dice_best_model.pth")

        def _write(state_snap, best, bests):
            if best:
                logging.info("save cur best avg model to %s", save_best)
                ckpt.save_best_model(save_best, state_snap.params,
                                     state_snap.batch_stats)
            ckpt.save_checkpoint(path, state_snap, epoch_num + 1, *bests)
            logging.info("save checkpoint to %s", path)

        self._ckpt_io.submit(
            _write, state_copy, is_best,
            (self.best_avg_dice, self.best_avg_dice_iter,
             self.stu_best_avg_dice, self.stu_best_avg_dice_iter))
