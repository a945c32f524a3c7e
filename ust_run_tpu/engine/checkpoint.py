"""Checkpoint I/O with the reference's artifact semantics.

Reference (utils/util.py:259-297, train.py:542-548, 946-958):
  * rolling `checkpoint.pth` after every epoch — full state: epoch,
    teacher, student, optimizer, best-dice bookkeeping;
  * `unet_avg_dice_best_model.pth` — student weights only, written on a
    new best student average dice; loaded by test.py:242;
  * `--load` resumes from `<model_root>/<dataset>/<save_name>/checkpoint.pth`
    (the `--load_path` flag is dead in the reference and stays dead here).

Format: numpy pytrees pickled with a manifest — self-contained, no torch.
The .pth names are preserved so existing experiment tooling finds them.
"""

import atexit
import os
import pickle
import threading

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _atomic_pickle(path, payload):
    """Serialize to a sibling temp file, fsync, then os.replace() into
    place — a crash or interpreter exit mid-write can never truncate the
    only resume artifact."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class AsyncCheckpointer:
    """Fetch + serialize checkpoints off the training thread.

    Fetching ~400MB of state to host costs tens of seconds on a tunneled
    TPU; the reference blocks its loop on torch.save the same way
    (train.py:955-958). Here the caller hands over device-side COPIES
    (safe against donation by subsequent steps) and a worker thread
    performs the host fetch + pickle while the next epoch trains.
    """

    def __init__(self):
        self._thread = None
        atexit.register(self.wait)  # in-flight saves complete at exit

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def submit(self, fn, *args):
        self.wait()
        self._thread = threading.Thread(target=fn, args=args)
        self._thread.start()


def device_copy(tree):
    """Fresh device buffers for every leaf (immune to later donation)."""
    return jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x,
                        tree)


def save_checkpoint(path, state, epoch, best_avg_dice, best_avg_dice_iter,
                    stu_best_avg_dice, stu_best_avg_dice_iter):
    payload = {
        "epoch": epoch,
        "state": _to_numpy(state),
        "best_dice": best_avg_dice,
        "best_iter": best_avg_dice_iter,
        "stu_best_dice": stu_best_avg_dice,
        "stu_best_iter": stu_best_avg_dice_iter,
    }
    _atomic_pickle(path, payload)


def load_checkpoint(path):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return payload


def save_best_model(path, params, batch_stats):
    """Student-only snapshot (train.py:946-949)."""
    _atomic_pickle(path, {"params": _to_numpy(params),
                          "batch_stats": _to_numpy(batch_stats)})


def restore_onto(live_state, payload_state):
    """Map a checkpoint payload onto the live train state with a real
    error message instead of a cryptic tree-structure failure when the
    checkpoint was produced by a different --model / patch size."""
    live_leaves, live_def = jax.tree.flatten(live_state)
    ck_leaves, ck_def = jax.tree.flatten(payload_state)
    if live_def != ck_def:
        raise ValueError(
            "checkpoint is incompatible with the configured model: the "
            "saved state tree does not match the live train state "
            f"({len(ck_leaves)} vs {len(live_leaves)} leaves). It was "
            "likely produced with a different --model or dataset profile.")
    for lv, cv in zip(live_leaves, ck_leaves):
        ls = tuple(getattr(lv, "shape", ()))
        cs = tuple(getattr(cv, "shape", ()))
        if ls != cs:
            raise ValueError(
                "checkpoint is incompatible with the configured model: a "
                f"saved array has shape {cs} where the live state expects "
                f"{ls} (different --model, patch size, or channel count).")
    return jax.tree.unflatten(live_def, ck_leaves)


def load_best_model(path, model="unet"):
    """Load a best-model artifact.

    Accepts both this framework's pickled pytrees and ORIGINAL reference
    torch checkpoints (zip-serialized state_dicts) — the latter are
    converted on the fly (utils/torch_import.py) for the given model
    family, so models trained with the PyTorch reference evaluate here
    unchanged."""
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"PK":  # torch zip serialization
        from ust_run_tpu.utils.torch_import import load_torch_checkpoint
        payload = load_torch_checkpoint(path, model=model)
        if "student" in payload:
            return payload["student"]
        return payload
    with open(path, "rb") as f:
        return pickle.load(f)
