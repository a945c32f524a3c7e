"""Train state: student/teacher pytrees + fixed-shape curriculum state.

The reference keeps its curriculum as dynamic python state — a
variable-length "simple sample" queue (train.py:554-560, 754-779) and a
nullable lowest-quality carry (train.py:576, 720-751). Under XLA
everything must be fixed-shape, so:

  * the queue is a capacity-`queue_len` ring with a validity mask, valid
    entries compacted to the front (insertion = prepend + truncate, the
    reference's exact retention rule);
  * the LQ carry is a 1-slot buffer with a validity flag, reset at every
    epoch boundary (the reference re-Nones it at train.py:576).
"""

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class CurriculumQueue(struct.PyTreeNode):
    img: Any        # (Q,S,S,C) f32 normalized weak images (simple_ulb)
    pl: Any         # (Q,S,S,2) f32 (fundus) | (Q,S,S) i32  (cor_pl)
    gt: Any         # same shape as pl — decoded true masks (cor_gt)
    conf: Any       # (Q,S,S,2) | (Q,S,S,1) f32 teacher conf masks (cor_mask)
    hardness: Any   # (Q,) f32 (cor_hardness)
    dc: Any         # (Q,) i32 (cor_dc)
    valid: Any      # (Q,) bool

    @property
    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))


class LQCarry(struct.PyTreeNode):
    img: Any        # (1,S,S,C)
    pl: Any         # (1,S,S,2) | (1,S,S)
    conf: Any       # (1,S,S,2) | (1,S,S,1)
    valid: Any      # () bool


class TrainState(struct.PyTreeNode):
    step: Any                    # () i32 — iter_num
    epoch: Any                   # () i32 — epoch_num (hardness forcing)
    params: Any
    batch_stats: Any
    ema_params: Any
    ema_batch_stats: Any
    opt_state: Any
    rng: Any
    queue: CurriculumQueue
    lq: LQCarry
    choice_th: Any               # () f32, init 0.1 (train.py:561)


def _pl_shapes(q, s, multilabel, num_classes):
    del num_classes
    if multilabel:
        pl = jnp.zeros((q, s, s, 2), jnp.float32)
        conf = jnp.zeros((q, s, s, 2), jnp.float32)
    else:
        pl = jnp.zeros((q, s, s), jnp.int32)
        conf = jnp.zeros((q, s, s, 1), jnp.float32)
    return pl, conf


def make_optimizer(base_lr, max_iterations):
    """torch SGD(momentum=0.9, wd=1e-4) over ALL params (train.py:512) with
    the poly LR schedule lr = base*(1-iter/max)^0.9 applied AFTER each step
    (train.py:854-856) — so update k uses the schedule value of k-1."""

    def schedule(count):
        eff = jnp.maximum(count - 1, 0).astype(jnp.float32)
        return base_lr * (1.0 - eff / max_iterations) ** 0.9

    return optax.chain(
        optax.add_decayed_weights(1e-4),
        optax.sgd(learning_rate=schedule, momentum=0.9),
    )


def create_train_state(model, hp, seed):
    """Initialize student + teacher with independent random draws (the
    reference builds two fresh models, train.py:496-506; the first EMA
    update with alpha=0 snaps the teacher to the student)."""
    k_stu, k_tea, k_run = jax.random.split(jax.random.PRNGKey(seed), 3)
    dummy = jnp.zeros((1, hp.patch, hp.patch, hp.channels), jnp.float32)
    stu_vars = model.init(k_stu, dummy, train=False)
    tea_vars = model.init(k_tea, dummy, train=False)
    tx = make_optimizer(hp.base_lr, hp.max_iterations)
    pl, conf = _pl_shapes(hp.queue_len, hp.patch, hp.multilabel,
                          hp.num_classes)
    gt, _ = _pl_shapes(hp.queue_len, hp.patch, hp.multilabel, hp.num_classes)
    pl1, conf1 = _pl_shapes(1, hp.patch, hp.multilabel, hp.num_classes)
    queue = CurriculumQueue(
        img=jnp.zeros((hp.queue_len, hp.patch, hp.patch, hp.channels),
                      jnp.float32),
        pl=pl, gt=gt, conf=conf,
        hardness=jnp.zeros((hp.queue_len,), jnp.float32),
        dc=jnp.zeros((hp.queue_len,), jnp.int32),
        valid=jnp.zeros((hp.queue_len,), bool),
    )
    lq = LQCarry(
        img=jnp.zeros((1, hp.patch, hp.patch, hp.channels), jnp.float32),
        pl=pl1, conf=conf1, valid=jnp.asarray(False),
    )
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        epoch=jnp.asarray(0, jnp.int32),
        params=stu_vars["params"],
        batch_stats=stu_vars["batch_stats"],
        ema_params=tea_vars["params"],
        ema_batch_stats=tea_vars["batch_stats"],
        opt_state=tx.init(stu_vars["params"]),
        rng=k_run,
        queue=queue,
        lq=lq,
        choice_th=jnp.asarray(0.1, jnp.float32),
    )


def reset_epoch(state, epoch):
    """Epoch-boundary reset: the LQ carry is re-Noned each epoch
    (train.py:576) and epoch feeds the hardness forcing (train.py:711-713).
    """
    return state.replace(
        epoch=jnp.asarray(epoch, jnp.int32),
        lq=state.lq.replace(valid=jnp.asarray(False)),
    )
