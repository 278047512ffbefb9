"""Checkpointing: Orbax save/restore + PyTorch weight import.

Reference behavior being reproduced (`/root/reference/train.py:204-209`):
save the latest state every epoch and a best-mAP-gated copy; eval tools load
a checkpoint file (eval.py:68, run_voc_mAP.py:68).  Upgrades over the
reference: resume is real (the reference's resume is a commented-out line,
train.py:100) and the optimizer/momentum state and step counter are part of
the checkpoint, not just module weights.

``import_torch_state_dict`` is the analog of the reference's ImageNet
weight surgery (train.py:62-78): copy every key whose name and shape match
our tree, leave the rest (e.g. the S=7 ``layer5``/``block5`` stages and the
detection head, which have no ImageNet weights) at their random init.
Handles both torchvision ImageNet state dicts and the reference's own
DataParallel checkpoints (``module.``-prefixed keys — SURVEY.md §5).
``export_torch_state_dict`` is the exact inverse: flax checkpoint ->
reference-layout .pth, strict-loadable by the reference's eval tools
(pinned live in test_torch_parity).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Mapping

import jax
import numpy as np
import orbax.checkpoint as ocp

from yolo_v1_tpu.train.state import TrainState


class CheckpointManager:
    """Latest/best checkpoint manager over Orbax.

    ``history_keep > 0`` additionally writes an ``epoch_NNNN`` copy per
    save and prunes to the newest k (top-k retention; the reference keeps
    only one rolling .pth + best.pth, train.py:204-209 — history is the
    production upgrade).  ``save(..., block=False)`` leaves the Orbax write
    in flight so the next epoch's compute overlaps the checkpoint I/O;
    writes are serialized against each other and ``wait()`` (or the next
    blocking save) drains them.
    """

    def __init__(self, base_path: str, history_keep: int = 0):
        self.base_path = os.path.abspath(base_path)
        os.makedirs(self.base_path, exist_ok=True)
        self.history_keep = history_keep
        self._ckptr = ocp.StandardCheckpointer()

    def _payload(self, state: TrainState) -> dict:
        return {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }

    # Scalars persisted alongside the state so resume restores the
    # best/last-mAP gates too (see train/loop.fit).
    _EXTRA_DEFAULTS = {"best_map": 0.0, "last_little_map": 0.0}

    def path(self, best: bool) -> str:
        return os.path.join(self.base_path, "best" if best else "latest")

    def save(
        self,
        state: TrainState,
        epoch: int,
        best: bool = False,
        extras: dict | None = None,
        block: bool = True,
        history: bool = True,
    ) -> None:
        """``epoch`` is the LAST COMPLETED epoch (-1 = none completed).

        ``history=False`` skips the ``epoch_NNNN`` retention copy — used by
        the trainer's pre-eval crash-safety save so each epoch's history
        dir is written once (by the post-eval refresh, with fresh gate
        extras) instead of twice per epoch on slow relay links.

        Multi-process: ``save`` is a COLLECTIVE — every process must call
        it with the same arguments (the Orbax write itself synchronizes
        processes and the primary writes each replicated array once).
        The surrounding directory bookkeeping (rename-aside crash guard,
        history pruning) runs on the coordinator only, ordered against
        the collective write by an explicit barrier; ``base_path`` must
        be a filesystem all processes share."""
        from yolo_v1_tpu.parallel.mesh import barrier, is_coordinator

        coord = is_coordinator()
        payload = self._payload(state)
        payload["epoch"] = epoch
        payload.update(self._EXTRA_DEFAULTS)
        if extras:
            payload.update({k: float(v) for k, v in extras.items()})
        # Serialize with any still-running async save (Orbax refuses
        # overlapping writes; the common case — one pending 'latest' from
        # the previous epoch — has had a whole epoch to finish).
        self._ckptr.wait_until_finished()
        target = self.path(best)
        prev = target + ".prev"
        # Crash-window guard: Orbax's force=True DELETES the existing
        # target before the tmp-dir write + atomic rename, so a crash (or
        # a relay stall killing the process — observed live on the
        # synth_hard run, epoch 79) between delete and rename loses the
        # only copy.  Rename the old target aside instead; it is removed
        # once the next write is known durable (the wait above / below).
        # restore()/exists() fall back to the .prev copy.
        if coord:
            shutil.rmtree(prev, ignore_errors=True)
            if os.path.isdir(target):
                os.rename(target, prev)
        barrier("ckpt_pre_save")  # rename-aside lands before anyone writes
        self._ckptr.save(target, payload, force=True)
        if history and self.history_keep > 0 and not best and epoch >= 0:
            self._ckptr.wait_until_finished()
            self._ckptr.save(
                os.path.join(self.base_path, f"epoch_{epoch:04d}"),
                payload, force=True,
            )
            if coord:
                self._prune_history(in_flight=epoch)
        if block:
            self._ckptr.wait_until_finished()
            if coord:
                shutil.rmtree(prev, ignore_errors=True)

    def _prune_history(self, in_flight: int) -> None:
        import re as _re

        # The save just dispatched may still be a tmp dir (Orbax renames on
        # completion), so count it explicitly; only ever delete *visible*
        # old dirs.
        on_disk = {
            int(m.group(1))
            for d in os.listdir(self.base_path)
            if (m := _re.match(r"^epoch_(\d+)$", d))
        }
        epochs = sorted(on_disk | {in_flight})
        for e in epochs[: max(0, len(epochs) - self.history_keep)]:
            if e in on_disk:
                shutil.rmtree(
                    os.path.join(self.base_path, f"epoch_{e:04d}"),
                    ignore_errors=True,
                )

    def wait(self) -> None:
        """Drain any in-flight async save (call before process exit)."""
        self._ckptr.wait_until_finished()

    def restore(
        self, state: TrainState, best: bool = False, path: str | None = None
    ) -> tuple[TrainState, int, dict]:
        """Restore into the structure of ``state``.

        ``path`` overrides the latest/best selection (e.g. a retained
        ``epoch_NNNN`` history directory).  Returns (state,
        last_completed_epoch, extras) — extras carries the persisted
        best/last-little mAP gates.
        """
        target = path if path is not None else self._resolve(self.path(best))
        template = self._payload(state)
        template["epoch"] = 0
        template.update(self._EXTRA_DEFAULTS)
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        try:
            restored = self._ckptr.restore(target, abstract)
        except ValueError:
            # Checkpoints written before the mAP gates were added lack the
            # extras keys and orbax refuses a mismatched template; retry
            # without them (the .get defaults below fill them in).
            for k in self._EXTRA_DEFAULTS:
                abstract.pop(k)
            restored = self._ckptr.restore(target, abstract)
        new_state = state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        extras = {
            k: float(restored.get(k, v)) for k, v in self._EXTRA_DEFAULTS.items()
        }
        return new_state, int(restored["epoch"]), extras

    def _resolve(self, target: str) -> str:
        """The live dir, or its ``.prev`` crash-window guard (a save that
        died between Orbax's delete and its atomic rename — see save())."""
        if os.path.isdir(target):
            return target
        if os.path.isdir(target + ".prev"):
            return target + ".prev"
        # Neither exists: name the real problem (restoring from a run dir
        # with no checkpoint) instead of letting Orbax complain about the
        # ``.prev`` fallback path nobody asked for.
        raise FileNotFoundError(
            f"no checkpoint at {target!r} (nor its .prev crash-window "
            f"copy) — run dir contents: {sorted(os.listdir(self.base_path)) if os.path.isdir(self.base_path) else 'missing dir'}"
        )

    def exists(self, best: bool = False) -> bool:
        try:
            return os.path.isdir(self._resolve(self.path(best)))
        except FileNotFoundError:
            return False


# ---------------------------------------------------------------------------
# PyTorch weight import
# ---------------------------------------------------------------------------

_BN_LEAF = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def _torch_key_to_path(key: str, arch: str) -> tuple[str, ...] | None:
    """Map a torch state-dict key to (collection, module..., leaf) or None."""
    key = re.sub(r"^module\.", "", key)  # DataParallel prefix (SURVEY.md §5)
    parts = key.split(".")
    if parts[-1] == "num_batches_tracked":
        return None

    if arch == "resnet":
        # conv1.weight / bn1.* / layerL.B.(convN|bnN|downsample.{0,1}).*
        if parts[0] == "conv1" and parts[-1] == "weight":
            return ("params", "conv1", "kernel")
        if parts[0] == "bn1":
            coll, leaf = _BN_LEAF[parts[-1]]
            return (coll, "bn1", leaf)
        if parts[0] == "layer6" and parts[-1] == "weight":
            return ("params", "head", "conv", "kernel")
        if parts[0] == "bn_end":
            coll, leaf = _BN_LEAF[parts[-1]]
            return (coll, "head", "bn", leaf)
        m = re.match(r"^layer(\d+)$", parts[0])
        if m and len(parts) >= 3:
            block = f"layer{m.group(1)}_{parts[1]}"
            if parts[2] == "downsample":
                if parts[3] == "0":
                    return ("params", block, "downsample_conv", "kernel")
                coll, leaf = _BN_LEAF[parts[-1]]
                return (coll, block, "downsample_bn", leaf)
            if parts[2].startswith("conv"):
                return ("params", block, parts[2], "kernel")
            if parts[2].startswith("bn"):
                coll, leaf = _BN_LEAF[parts[-1]]
                return (coll, block, parts[2], leaf)
        return None

    if arch == "densenet":
        if parts[0] == "features":
            parts = parts[1:]
        if parts[0] == "conv0":
            return ("params", "conv0", "kernel")
        if parts[0] in ("norm0", "norm5"):
            coll, leaf = _BN_LEAF[parts[-1]]
            return (coll, parts[0], leaf)
        if parts[0] == "layer6" and parts[-1] == "weight":
            return ("params", "head", "conv", "kernel")
        if parts[0] == "bn_end":
            coll, leaf = _BN_LEAF[parts[-1]]
            return (coll, "head", "bn", leaf)
        m = re.match(r"^denseblock(\d+)$", parts[0])
        if m:
            lm = re.match(r"^denselayer(\d+)$", parts[1])
            block = f"block{m.group(1)}_layer{lm.group(1)}"
            if parts[2].startswith("conv"):
                return ("params", block, parts[2], "kernel")
            coll, leaf = _BN_LEAF[parts[-1]]
            return (coll, block, parts[2], leaf)
        m = re.match(r"^transition(\d+)$", parts[0])
        if m:
            mod = f"transition{m.group(1)}"
            if parts[1] == "conv":
                return ("params", mod, "conv", "kernel")
            coll, leaf = _BN_LEAF[parts[-1]]
            return (coll, mod, "norm", leaf)
        return None

    raise ValueError(f"unknown arch {arch!r}")


def import_torch_state_dict(
    state_dict: Mapping[str, Any],
    params: Any,
    batch_stats: Any,
    arch: str,
) -> tuple[Any, Any, dict]:
    """Copy matching torch weights into flax trees (filtered-copy semantics
    of train.py:62-67: only keys that exist AND shape-match are taken).

    Conv kernels transpose from torch [out, in, kh, kw] to flax
    [kh, kw, in, out].

    Returns (params, batch_stats, report) where report lists 'copied',
    'skipped_missing', 'skipped_shape'.
    """
    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    trees = {"params": params, "batch_stats": batch_stats}
    report = {"copied": [], "skipped_missing": [], "skipped_shape": []}

    for key, value in state_dict.items():
        path = _torch_key_to_path(key, arch)
        if path is None:
            if not key.endswith("num_batches_tracked"):
                report["skipped_missing"].append(key)
            continue
        coll, *mods, leaf = path
        node = trees[coll]
        ok = True
        for mod in mods:
            if mod not in node:
                ok = False
                break
            node = node[mod]
        if not ok or leaf not in node:
            report["skipped_missing"].append(key)
            continue
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
        if leaf == "kernel":
            arr = arr.transpose(2, 3, 1, 0)
        if arr.shape != node[leaf].shape:
            report["skipped_shape"].append(key)
            continue
        node[leaf] = arr.astype(node[leaf].dtype)
        report["copied"].append(key)

    return trees["params"], trees["batch_stats"], report


def export_torch_state_dict(
    params: Any,
    batch_stats: Any,
    arch: str,
    prefix: str = "",
) -> dict[str, np.ndarray]:
    """Inverse of ``import_torch_state_dict``: flax trees -> a torch-layout
    state dict with the reference nets' own key names, so a model trained
    here loads strict into the reference's eval tools (eval.py:68,
    run_voc_mAP.py:68) and, conversely, round-trips through our import.

    Conv kernels transpose back to torch [out, in, kh, kw]; every BN gets a
    zero ``num_batches_tracked`` (torch tracks it, eval never reads it).
    ``prefix='module.'`` matches the reference's DataParallel checkpoints —
    its eval tools wrap the net in DataParallel BEFORE load_state_dict
    (SURVEY.md §5), so they expect prefixed keys.
    """
    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    out: dict[str, np.ndarray] = {}

    def put_conv(tkey: str, node) -> None:
        out[prefix + tkey + ".weight"] = np.ascontiguousarray(
            np.asarray(node["kernel"], np.float32).transpose(3, 2, 0, 1)
        )

    def put_bn(tmod: str, pnode, snode) -> None:
        out[prefix + tmod + ".weight"] = np.asarray(pnode["scale"], np.float32)
        out[prefix + tmod + ".bias"] = np.asarray(pnode["bias"], np.float32)
        out[prefix + tmod + ".running_mean"] = np.asarray(
            snode["mean"], np.float32
        )
        out[prefix + tmod + ".running_var"] = np.asarray(
            snode["var"], np.float32
        )
        out[prefix + tmod + ".num_batches_tracked"] = np.zeros((), np.int64)

    if arch == "resnet":
        for mod, node in params.items():
            if mod == "conv1":
                put_conv("conv1", node)
            elif mod == "bn1":
                put_bn("bn1", node, batch_stats["bn1"])
            elif mod == "head":
                put_conv("layer6", node["conv"])
                put_bn("bn_end", node["bn"], batch_stats["head"]["bn"])
            else:
                m = re.match(r"^layer(\d+)_(\d+)$", mod)
                if not m:
                    raise ValueError(f"unmapped resnet module {mod!r}")
                base = f"layer{m.group(1)}.{m.group(2)}"
                for ck, cv in node.items():
                    if ck == "downsample_conv":
                        put_conv(base + ".downsample.0", cv)
                    elif ck == "downsample_bn":
                        put_bn(
                            base + ".downsample.1", cv, batch_stats[mod][ck]
                        )
                    elif ck.startswith("conv"):
                        put_conv(f"{base}.{ck}", cv)
                    elif ck.startswith("bn"):
                        put_bn(f"{base}.{ck}", cv, batch_stats[mod][ck])
                    else:
                        raise ValueError(f"unmapped {mod}/{ck}")
        return out

    if arch == "densenet":
        for mod, node in params.items():
            if mod == "conv0":
                put_conv("features.conv0", node)
            elif mod in ("norm0", "norm5"):
                put_bn(f"features.{mod}", node, batch_stats[mod])
            elif mod == "head":
                put_conv("layer6", node["conv"])
                put_bn("bn_end", node["bn"], batch_stats["head"]["bn"])
            else:
                m = re.match(r"^block(\d+)_layer(\d+)$", mod)
                t = re.match(r"^transition(\d+)$", mod)
                if m:
                    base = (
                        f"features.denseblock{m.group(1)}"
                        f".denselayer{m.group(2)}"
                    )
                elif t:
                    base = f"features.transition{t.group(1)}"
                else:
                    raise ValueError(f"unmapped densenet module {mod!r}")
                for ck, cv in node.items():
                    if ck.startswith("conv"):
                        put_conv(f"{base}.{ck}", cv)
                    elif ck.startswith("norm"):
                        put_bn(f"{base}.{ck}", cv, batch_stats[mod][ck])
                    else:
                        raise ValueError(f"unmapped {mod}/{ck}")
        return out

    raise ValueError(f"unknown arch {arch!r}")


def save_torch_file(path: str, state_dict: Mapping[str, np.ndarray]) -> None:
    """Write a .pth consumable by the reference's eval tools (CPU torch)."""
    import torch

    torch.save(
        # copy: jax-backed numpy views are read-only, which from_numpy warns
        # about (and the tensor would alias freed device memory besides).
        {k: torch.from_numpy(np.array(v)) for k, v in state_dict.items()},
        path,
    )


def load_torch_file(path: str) -> dict:
    """Read a .pth state dict with CPU torch (lazy import — torch is only
    needed for weight conversion, never in the training path)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return dict(obj)
