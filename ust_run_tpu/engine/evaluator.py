"""Per-domain evaluation.

Capability parity with reference `test()` (train.py:253-395; standalone
test.py:64-195; MNMS variant train_mnms.py:253-388):

  * per-domain loop over test loaders, dataset-specific mask decode;
  * smoothed Dice per part via the reference formula, averaged per domain
    then across domains;
  * boundary metrics dc/jc/hd95/asd per sample per part with the
    empty-prediction => hd=asd=100 convention (train.py:313-315);
  * scalars to the metric writer, text summary to the log;
  * returns the per-part val dice list for best-model tracking.

TPU-native differences: the forward runs jitted on fixed padded batches
(the reference uses batch_size=1 host loops) and shards over the device
mesh when one is provided — batch on the "data" axis, weights replicated;
dice and the loss are computed on device, per sample, so padded tail
batches contribute exactly (the reference's bs=1 loop semantics). Only
the boolean maps needed for boundary metrics are fetched to host, and the
host EDT work runs on a worker thread overlapped with the next batch's
device forward (SURVEY section 7.6). The reference's `domain_val_loss` is
famously never accumulated (train.py:289 computes `loss_seg` into a dead
variable) — we log the real mean loss instead.
"""

import logging
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from ust_run_tpu.ops import augment
from ust_run_tpu.semisup.step import decode_mask
from ust_run_tpu.utils import losses as L
from ust_run_tpu.utils import metrics as M
from ust_run_tpu.utils.boundary_native import boundary_metrics


class Evaluator:
    def __init__(self, model, hp, test_loaders, parts,
                 compute_boundary=True, mesh=None):
        self.model = model
        self.hp = hp
        self.loaders = test_loaders
        self.parts = parts
        self.n_part = len(parts)
        self.compute_boundary = compute_boundary
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._pad_rows = 0
        jit_kwargs = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            batch = len(test_loaders[0].ds) and test_loaders[0].batch
            axis = mesh.shape["data"]
            if batch and batch % axis:
                # Indivisible eval batch: pad each dispatched batch up to
                # the next mesh multiple instead of replicating — the
                # validity mask already nulls padded rows, so results are
                # identical and eval stays sharded on "data".
                self._pad_rows = (-batch) % axis
                logging.info(
                    "eval batch %s not divisible by data axis %s: "
                    "padding dispatch batches by %s rows to keep eval "
                    "sharded", batch, axis, self._pad_rows)
            bsh = NamedSharding(mesh, P("data"))
            jit_kwargs = dict(in_shardings=(repl, repl, bsh, bsh))
        self._fwd = jax.jit(self._forward, **jit_kwargs)

    def _forward(self, params, batch_stats, img_u8, lab_u8):
        hp = self.hp
        x = augment.normalize(img_u8.astype(jnp.float32))
        logits = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False)
        mask = decode_mask(lab_u8, hp.dataset)
        # per-sample loss (the reference evaluates with batch_size=1,
        # train.py:289-290, so the per-domain mean is over samples; a
        # batch-mean over a padded batch would weight the tail wrong)
        loss = jax.vmap(
            lambda lg, mk: L.ce_plus_dice(
                lg[None], mk[None], multilabel=hp.multilabel,
                n_classes=hp.num_classes))(logits, mask)
        if hp.multilabel:
            pred = (jax.nn.sigmoid(logits) >= 0.5)          # train.py:293
            dice = M.dice_per_part_jax(pred, mask, self.n_part)
            pred_parts = pred                                # (B,S,S,2)
            mask_parts = mask > 0.5
        else:
            pred = jnp.argmax(jax.nn.softmax(logits, -1), -1)  # :297
            if self.n_part == 1:
                dice = M.dice_per_part_jax(pred == 1, mask == 1, 1)
                pred_parts = (pred == 1)[..., None]
                mask_parts = (mask == 1)[..., None]
            else:
                dice = M.dice_per_part_jax(pred, mask, self.n_part)
                pred_parts = jnp.stack(
                    [pred == c for c in range(1, self.n_part + 1)], axis=-1)
                mask_parts = jnp.stack(
                    [mask == c for c in range(1, self.n_part + 1)], axis=-1)
        return dice, loss, pred_parts, mask_parts

    def _boundary_task(self, pred_parts, mask_parts, valid):
        """Host-side EDT metrics for one batch; runs on the worker thread
        (the ctypes call releases the GIL) while the main thread
        dispatches the next device forward."""
        np_ = self.n_part
        pp = np.asarray(pred_parts)[valid]
        mp = np.asarray(mask_parts)[valid]
        acc = np.zeros((4, np_))
        for j in range(pp.shape[0]):
            for i in range(np_):
                p = pp[j, ..., i]
                g = mp[j, ..., i]
                d, jcc, hd, asd_v = boundary_metrics(p, g)
                acc[0, i] += d
                acc[1, i] += jcc
                if p.sum() < 1e-4:                          # train.py:313
                    acc[2, i] += 100
                    acc[3, i] += 100
                else:
                    acc[2, i] += hd
                    acc[3, i] += asd_v
        return acc

    def run(self, params, batch_stats, epoch, writer=None, ema=True):
        """Returns per-part val dice averaged over domains
        (train.py:368-395)."""
        hp = self.hp
        model_name = "ema" if ema else "stu"
        np_ = self.n_part
        val_dice = np.zeros(np_)
        val_dc = np.zeros(np_)
        val_jc = np.zeros(np_)
        val_hd = np.zeros(np_)
        val_asd = np.zeros(np_)
        val_loss = 0.0
        domain_num = len(self.loaders)

        for d_i, loader in enumerate(self.loaders):
            domain_code = d_i + 1
            dom_dice = np.zeros(np_)
            dom_dc = np.zeros(np_)
            dom_jc = np.zeros(np_)
            dom_hd = np.zeros(np_)
            dom_asd = np.zeros(np_)
            dom_loss = 0.0
            n = 0
            futures = []
            for batch in loader:
                img, lab = batch["image"], batch["label"]
                valid = batch["valid"]
                if self._pad_rows:
                    r = self._pad_rows
                    img = np.pad(img, ((0, r),) + ((0, 0),) * (img.ndim - 1))
                    lab = np.pad(lab, ((0, r),) + ((0, 0),) * (lab.ndim - 1))
                    valid = np.concatenate([valid, np.zeros(r, bool)])
                dice, loss, pred_parts, mask_parts = self._fwd(
                    params, batch_stats, img, lab)
                k = int(valid.sum())
                dice = np.asarray(dice)[:, valid]           # (P, k)
                dom_dice += dice.sum(axis=1)
                dom_loss += float(np.asarray(loss)[valid].sum())  # exact
                n += k
                if self.compute_boundary:
                    futures.append(self._pool.submit(
                        self._boundary_task, pred_parts, mask_parts, valid))
            for f in futures:
                acc = f.result()
                dom_dc += acc[0]
                dom_jc += acc[1]
                dom_hd += acc[2]
                dom_asd += acc[3]
            dom_dice /= n
            dom_dc /= n
            dom_jc /= n
            dom_hd /= n
            dom_asd /= n
            dom_loss /= max(n, 1)
            val_dice += dom_dice
            val_dc += dom_dc
            val_jc += dom_jc
            val_hd += dom_hd
            val_asd += dom_asd
            val_loss += dom_loss
            if writer is not None:
                writer.add_scalar(
                    f"{model_name}_val/domain{domain_code}/loss",
                    dom_loss, epoch)
                for i, p in enumerate(self.parts):
                    writer.add_scalar(
                        f"{model_name}_val/domain{domain_code}/val_{p}_dice",
                        dom_dice[i], epoch)
            text = "domain%d epoch %d : loss : %f" % (domain_code, epoch,
                                                      dom_loss)
            text += "\n\t"
            for i, p in enumerate(self.parts):
                text += "val_%s_dice: %f, " % (p, dom_dice[i])
            text += "\n\t"
            for i, p in enumerate(self.parts):
                text += "val_%s_dc: %f, " % (p, dom_dc[i])
            text += "\t"
            for i, p in enumerate(self.parts):
                text += "val_%s_jc: %f, " % (p, dom_jc[i])
            text += "\n\t"
            for i, p in enumerate(self.parts):
                text += "val_%s_hd: %f, " % (p, dom_hd[i])
            text += "\t"
            for i, p in enumerate(self.parts):
                text += "val_%s_asd: %f, " % (p, dom_asd[i])
            logging.info(text)

        val_dice /= domain_num
        val_dc /= domain_num
        val_jc /= domain_num
        val_hd /= domain_num
        val_asd /= domain_num
        val_loss /= domain_num
        if writer is not None:
            writer.add_scalar(f"{model_name}_val/loss", val_loss, epoch)
            for i, p in enumerate(self.parts):
                writer.add_scalar(f"{model_name}_val/val_{p}_dice",
                                  val_dice[i], epoch)
        text = "epoch %d : loss : %f" % (epoch, val_loss)
        text += "\n\t"
        for i, p in enumerate(self.parts):
            text += "val_%s_dice: %f, " % (p, val_dice[i])
        text += "\n\t"
        for i, p in enumerate(self.parts):
            text += "val_%s_dc: %f, " % (p, val_dc[i])
        text += "\t"
        for i, p in enumerate(self.parts):
            text += "val_%s_jc: %f, " % (p, val_jc[i])
        text += "\n\t"
        for i, p in enumerate(self.parts):
            text += "val_%s_hd: %f, " % (p, val_hd[i])
        text += "\t"
        for i, p in enumerate(self.parts):
            text += "val_%s_asd: %f, " % (p, val_asd[i])
        logging.info(text)
        return list(val_dice)
