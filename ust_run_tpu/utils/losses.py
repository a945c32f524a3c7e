"""Segmentation losses as pure jnp functions.

Capability parity with reference utils/losses.py (DiceLossWithMask,
losses.py:194-268) and the CE/BCE usage at train.py:515-521 / 816-838.

Conventions (all NHWC):
  * `logits`: (B, H, W, C) raw network outputs.
  * multilabel ("fundus") targets: (B, H, W, C) float {0,1}; per-pixel
    validity masks share that shape.
  * multiclass targets: (B, H, W) int class maps; masks are (B, H, W, 1).

Reduction quirks of the reference are preserved exactly:
  * masked CE is `(ce * mask).mean()` — the mean is over ALL pixels, not
    only the masked ones (train.py:826-836).
  * `DiceLossWithMask` computes ONE global soft dice over the entire
    (batch+spatial[+class]) volume in `multi` mode (losses.py:225-249), and
    per-class global dice otherwise — and its `_one_hot_mask_encoder`
    leaves class 0 UNMASKED (`mask*0 == 0` is always true,
    losses.py:207-213).
"""

import jax
import jax.numpy as jnp

_SMOOTH = 1e-10  # losses.py:218,228


def _soft_dice(score, target, mask=None):
    """1 - (2*sum(s*t)+eps) / (sum(t*t)+sum(s*s)+eps), optionally masked.

    Reference: losses.py:215-234. Reduces over ALL axes (global dice).
    """
    score = score.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if mask is not None:
        mask = mask.astype(jnp.float32)
        inter = jnp.sum(score * target * mask)
        t_sum = jnp.sum(target * target * mask)
        s_sum = jnp.sum(score * score * mask)
    else:
        inter = jnp.sum(score * target)
        t_sum = jnp.sum(target * target)
        s_sum = jnp.sum(score * score)
    return 1.0 - (2.0 * inter + _SMOOTH) / (s_sum + t_sum + _SMOOTH)


def dice_loss_multilabel(logits, target, mask=None):
    """Fundus path: sigmoid probs, one global dice over everything.

    Reference: DiceLossWithMask.forward with sigmoid=True, multi=True
    (losses.py:236-249; called at train.py:817 with softmax=False,
    sigmoid=True, multi=True).
    """
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    return _soft_dice(probs, target, mask)


def dice_loss_multiclass(logits, target, n_classes, mask=None):
    """Softmax path: per-class global dice averaged over classes.

    Reference: DiceLossWithMask.forward with softmax=True (losses.py:243,
    250-268). The mask one-hot encoder quirk is preserved: class 0 is
    never masked (losses.py:207-213 — `input*0 == 0` is identically true).

    target: (B,H,W) int; mask: (B,H,W,1) or None.
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    loss = 0.0
    for c in range(n_classes):
        tgt_c = (target == c).astype(jnp.float32)
        if mask is not None:
            # class 0: mask*0==0 always -> all-ones mask; class>=1: mask==1
            mask_c = None if c == 0 else (mask[..., 0] == 1).astype(jnp.float32)
        else:
            mask_c = None
        loss = loss + _soft_dice(probs[..., c], tgt_c, mask_c)
    return loss / n_classes


def bce_with_logits(logits, target):
    """Elementwise BCE-with-logits, reduction='none' (train.py:516).

    Numerically stable form: max(x,0) - x*t + log(1+exp(-|x|)).
    """
    x = logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    return jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))


def softmax_ce(logits, target):
    """Elementwise softmax cross-entropy, reduction='none' (train.py:519).

    logits: (B,H,W,C); target: (B,H,W) int. Returns (B,H,W).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot contraction, NOT take_along_axis: the per-pixel 1-element
    # gather lowers to a scalar path on TPU — profiled at ~5 ms per CE
    # term on the MNMS step (4 terms = 21 ms, 15.6% of the step; PERF.md
    # r5 bucket table). The C-term multiply-sum is exact (one 1.0 lane,
    # C-1 exact-0.0 lanes) and fuses into the log_softmax.
    classes = jax.lax.broadcasted_iota(
        jnp.int32, (logits.shape[-1],), 0)
    onehot = (target[..., None].astype(jnp.int32) == classes).astype(
        jnp.float32)
    return -jnp.sum(logp * onehot, axis=-1)


def ce_plus_dice(logits, target, *, multilabel, n_classes, mask=None):
    """The `ce.mean() + dice(...)` combination used everywhere in the
    reference hot loop (train.py:816-838).

    For the masked variants the CE term is `(ce * mask).mean()` with the
    mean over all elements (reference reduction quirk).
    """
    if multilabel:
        ce = bce_with_logits(logits, target)
        if mask is not None:
            ce = ce * mask.astype(jnp.float32)
        ce_term = jnp.mean(ce)
        dice_term = dice_loss_multilabel(logits, target, mask)
    else:
        ce = softmax_ce(logits, target)
        if mask is not None:
            ce = ce * mask[..., 0].astype(jnp.float32)
        ce_term = jnp.mean(ce)
        dice_term = dice_loss_multiclass(logits, target, n_classes, mask)
    return ce_term + dice_term


def dice_loss_plain(score, target, smooth=1e-5):
    """Unmasked soft dice with 1e-5 smoothing (losses.py:8-16 /
    DiceLoss._dice_loss at :169-177)."""
    score = score.astype(jnp.float32)
    target = target.astype(jnp.float32)
    inter = jnp.sum(score * target)
    return 1.0 - (2.0 * inter + smooth) / (
        jnp.sum(score * score) + jnp.sum(target * target) + smooth)


def focal_loss(logits, target, gamma=2.0, alpha=None, size_average=True):
    """Multi-class focal loss (reference FocalLoss, losses.py:119-153).

    logits: (..., C); target: (...) int. alpha: None | scalar | (C,) list.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logpt = jnp.take_along_axis(
        logp, target[..., None].astype(jnp.int32), axis=-1)[..., 0]
    pt = jnp.exp(logpt)
    if alpha is not None:
        if jnp.ndim(alpha) == 0:
            alpha = jnp.asarray([alpha, 1 - alpha], jnp.float32)
        at = jnp.take(jnp.asarray(alpha, jnp.float32), target)
        logpt = logpt * at
    loss = -((1 - pt) ** gamma) * logpt
    return jnp.mean(loss) if size_average else jnp.sum(loss)


def softmax_dice_loss(input_logits, target_logits):
    """Per-class soft dice between two softmax outputs, averaged over
    classes (losses.py:39-56)."""
    a = jax.nn.softmax(input_logits, axis=-1)
    b = jax.nn.softmax(target_logits, axis=-1)
    n = input_logits.shape[-1]
    total = 0.0
    for c in range(n):
        score = a[..., c]
        target = b[..., c]
        inter = jnp.sum(score * target)
        total = total + 1.0 - (2 * inter + 1e-5) / (
            jnp.sum(score) + jnp.sum(target) + 1e-5)
    return total / n


# ---------------------------------------------------------------------------
# Auxiliary consistency losses (reference utils/losses.py:30-116, 271-295).
# Provided for API completeness; the main algorithm uses CE+Dice only.
# ---------------------------------------------------------------------------

def softmax_mse_loss(input_logits, target_logits, sigmoid=False):
    """Elementwise MSE between softmax/sigmoid outputs (losses.py:65-82)."""
    if sigmoid:
        a = jax.nn.sigmoid(input_logits)
        b = jax.nn.sigmoid(target_logits)
    else:
        a = jax.nn.softmax(input_logits, axis=-1)
        b = jax.nn.softmax(target_logits, axis=-1)
    return (a - b) ** 2


def softmax_kl_loss(input_logits, target_logits, sigmoid=False):
    """Mean KL(target || input) (losses.py:85-104)."""
    if sigmoid:
        logp = jnp.log(jax.nn.sigmoid(input_logits))
        q = jax.nn.sigmoid(target_logits)
    else:
        logp = jax.nn.log_softmax(input_logits, axis=-1)
        q = jax.nn.softmax(target_logits, axis=-1)
    # torch F.kl_div(input=logp, target=q, reduction='mean') averages
    # q*(log q - logp) over all elements.
    return jnp.mean(q * (jnp.log(jnp.clip(q, 1e-30)) - logp))


def entropy_loss(probs, n_classes=2):
    """Normalized mean entropy (losses.py:30-36)."""
    ent = -jnp.sum(probs * jnp.log(probs + 1e-6), axis=-1) / jnp.log(n_classes)
    return jnp.mean(ent)


def entropy_map(probs):
    """Per-pixel entropy map (losses.py:278-281)."""
    return -jnp.sum(probs * jnp.log(probs + 1e-6), axis=-1, keepdims=True)
