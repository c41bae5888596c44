"""Import reference PyTorch CILRS checkpoints into Flax parameters.

A reference user's `checkpoint_best.pth` (saved by the training notebook:
{"model_state_dict": ..., "epoch", "val_loss", ...}) loads directly into this
framework — including the NumPy-2-pickled-under-NumPy-1 case the reference works
around with its `numpy._core` alias shim (model/autonomous_drive.py:35-44,
docs/TROUBLESHOOTING.md:84-115); we install the same alias both directions.

Mapping (torch names from the reference CILRS, model/autonomous_drive.py:361-387):
  visual_encoder.0..9   torchvision resnet34 conv1/bn1/layer{1..4}  -> ResNet34
  speed_encoder.{0,3}   Linear 1->128->128                          -> speed_fc{1,2}
  speed_predictor.{0,3,5} Linear 512->256->256->1                   -> speed_pred_*
  control_branches.{k}.{0,3,6} per-command Linear stacks            -> stacked branch tensors

Conv weights transpose OIHW -> HWIO; Linear weights transpose [out,in] -> [in,out].
The 4 torch branch modules interleave into the single stacked [D, K*H]/[K,H,H]/
[K,H,3] tensors our BranchHeads contracts with einsum.
"""

from __future__ import annotations

import sys
import types

import numpy as np


def _install_numpy_pickle_shims():
    """Allow unpickling checkpoints across the NumPy 1/2 module rename."""
    import numpy.core as _nc

    if "numpy._core" not in sys.modules:
        mod = types.ModuleType("numpy._core")
        mod.__dict__.update(_nc.__dict__)
        sys.modules["numpy._core"] = mod
        for sub in ("multiarray", "umath", "_multiarray_umath"):
            full = f"numpy._core.{sub}"
            if full not in sys.modules and hasattr(_nc, sub):
                sys.modules[full] = getattr(_nc, sub)


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch checkpoint file -> flat {name: numpy array}."""
    _install_numpy_pickle_shims()
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model_state_dict", blob) if isinstance(blob, dict) else blob
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def _conv(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):  # [out, in] -> [in, out]
    return np.transpose(w, (1, 0))


# torchvision resnet34 sequential slots inside the reference's visual_encoder:
# 0 conv1, 1 bn1, 2 relu, 3 maxpool, 4..7 layer1..layer4, 8 avgpool, 9 flatten.
_STAGE_SLOTS = {4: "layer1", 5: "layer2", 6: "layer3", 7: "layer4"}
_STAGE_SIZES = {"layer1": 3, "layer2": 4, "layer3": 6, "layer4": 3}


def convert_reference_cilrs(sd: dict[str, np.ndarray], num_commands: int = 4):
    """Reference torch state dict -> (params, batch_stats) pytrees for our CILRS."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def bn(prefix_t, path_f):
        put(params, path_f + ("scale",), sd[prefix_t + ".weight"])
        put(params, path_f + ("bias",), sd[prefix_t + ".bias"])
        put(stats, path_f + ("mean",), sd[prefix_t + ".running_mean"])
        put(stats, path_f + ("var",), sd[prefix_t + ".running_var"])

    ve = "visual_encoder"
    enc = ("visual_encoder",)
    put(params, enc + ("conv1", "kernel"), _conv(sd[f"{ve}.0.weight"]))
    bn(f"{ve}.1", enc + ("bn1",))
    for slot, layer in _STAGE_SLOTS.items():
        stage = int(layer[-1])
        for block in range(_STAGE_SIZES[layer]):
            t = f"{ve}.{slot}.{block}"
            f = enc + (f"layer{stage}_{block}",)
            put(params, f + ("conv1", "kernel"), _conv(sd[f"{t}.conv1.weight"]))
            bn(f"{t}.bn1", f + ("bn1",))
            put(params, f + ("conv2", "kernel"), _conv(sd[f"{t}.conv2.weight"]))
            bn(f"{t}.bn2", f + ("bn2",))
            if f"{t}.downsample.0.weight" in sd:
                put(params, f + ("downsample_conv", "kernel"),
                    _conv(sd[f"{t}.downsample.0.weight"]))
                bn(f"{t}.downsample.1", f + ("downsample_bn",))

    # Speed encoder: Sequential slots 0 and 3 are the Linears.
    put(params, ("speed_fc1", "kernel"), _lin(sd["speed_encoder.0.weight"]))
    put(params, ("speed_fc1", "bias"), sd["speed_encoder.0.bias"])
    put(params, ("speed_fc2", "kernel"), _lin(sd["speed_encoder.3.weight"]))
    put(params, ("speed_fc2", "bias"), sd["speed_encoder.3.bias"])

    # Aux speed head: slots 0, 3, 5.
    put(params, ("speed_pred_fc1", "kernel"), _lin(sd["speed_predictor.0.weight"]))
    put(params, ("speed_pred_fc1", "bias"), sd["speed_predictor.0.bias"])
    put(params, ("speed_pred_fc2", "kernel"), _lin(sd["speed_predictor.3.weight"]))
    put(params, ("speed_pred_fc2", "bias"), sd["speed_predictor.3.bias"])
    put(params, ("speed_pred_out", "kernel"), _lin(sd["speed_predictor.5.weight"]))
    put(params, ("speed_pred_out", "bias"), sd["speed_predictor.5.bias"])

    # Branches: 4 torch Sequentials (slots 0, 3, 6) -> stacked tensors.
    K, H, D, O = num_commands, 256, 640, 3
    w1 = np.zeros((D, K * H), np.float32)
    b1 = np.zeros((K * H,), np.float32)
    w2 = np.zeros((K, H, H), np.float32)
    b2 = np.zeros((K, H), np.float32)
    w3 = np.zeros((K, H, O), np.float32)
    b3 = np.zeros((K, O), np.float32)
    for k in range(K):
        t = f"control_branches.{k}"
        w1[:, k * H : (k + 1) * H] = _lin(sd[f"{t}.0.weight"])
        b1[k * H : (k + 1) * H] = sd[f"{t}.0.bias"]
        w2[k] = _lin(sd[f"{t}.3.weight"])
        b2[k] = sd[f"{t}.3.bias"]
        w3[k] = _lin(sd[f"{t}.6.weight"])
        b3[k] = sd[f"{t}.6.bias"]
    branches = {"w1": w1, "b1": b1, "w2": w2, "b2": b2, "w3": w3, "b3": b3}
    params["branches"] = branches

    return params, stats


def load_reference_checkpoint(path: str, num_commands: int = 4):
    """One call: torch .pth file -> {"params", "batch_stats"} for CILRS.apply."""
    import jax

    sd = load_torch_state_dict(path)
    params, stats = convert_reference_cilrs(sd, num_commands)
    to_jnp = lambda tree: jax.tree.map(lambda x: jax.numpy.asarray(x), tree)
    return {"params": to_jnp(params), "batch_stats": to_jnp(stats)}


def convert_torchvision_resnet34(sd: dict[str, np.ndarray]):
    """Plain torchvision resnet34 state dict (names conv1/bn1/layer{1..4}.*)
    -> (trunk params, trunk batch_stats) under the "visual_encoder" scope.

    This is the ImageNet-pretrained-trunk path: the reference's TRAINING copy
    initializes from `models.ResNet34_Weights.DEFAULT` (notebook PART B,
    SURVEY.md §2.1 "CILRS model (training copy)"). Save the weights once with
    `torch.save(resnet34(weights=DEFAULT).state_dict(), "resnet34.pth")` and
    pass the file to --pretrained-backbone. The classifier fc.* is ignored.
    """
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def bn(prefix_t, path_f):
        put(params, path_f + ("scale",), sd[prefix_t + ".weight"])
        put(params, path_f + ("bias",), sd[prefix_t + ".bias"])
        put(stats, path_f + ("mean",), sd[prefix_t + ".running_mean"])
        put(stats, path_f + ("var",), sd[prefix_t + ".running_var"])

    enc = ("visual_encoder",)
    put(params, enc + ("conv1", "kernel"), _conv(sd["conv1.weight"]))
    bn("bn1", enc + ("bn1",))
    for layer, nblocks in _STAGE_SIZES.items():
        stage = int(layer[-1])
        for block in range(nblocks):
            t = f"{layer}.{block}"
            f = enc + (f"layer{stage}_{block}",)
            put(params, f + ("conv1", "kernel"), _conv(sd[f"{t}.conv1.weight"]))
            bn(f"{t}.bn1", f + ("bn1",))
            put(params, f + ("conv2", "kernel"), _conv(sd[f"{t}.conv2.weight"]))
            bn(f"{t}.bn2", f + ("bn2",))
            if f"{t}.downsample.0.weight" in sd:
                put(params, f + ("downsample_conv", "kernel"),
                    _conv(sd[f"{t}.downsample.0.weight"]))
                bn(f"{t}.downsample.1", f + ("downsample_bn",))
    return params, stats


def init_trunk_from_torchvision(params, batch_stats, path_or_sd):
    """Graft an ImageNet-pretrained resnet34 onto the visual_encoder of an
    existing (params, batch_stats) pair; heads stay as initialized. Accepts a
    .pth path or an already-loaded {name: array} dict. Returns new trees."""
    import jax

    sd = (load_torch_state_dict(path_or_sd)
          if isinstance(path_or_sd, str) else path_or_sd)
    trunk_p, trunk_s = convert_torchvision_resnet34(sd)

    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = merge(out[k], v)
            else:
                expect = jax.tree.leaves(out[k])[0].shape if k in out else None
                assert expect == np.asarray(v).shape, (
                    f"shape mismatch grafting {k}: {expect} vs {np.asarray(v).shape}")
                out[k] = jax.numpy.asarray(v)
        return out

    return merge(params, trunk_p), merge(batch_stats, trunk_s)
