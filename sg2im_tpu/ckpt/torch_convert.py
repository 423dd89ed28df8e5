"""Converter: reference PyTorch ``.pt`` checkpoints -> flax variable trees.

The reference persists one mega-dict per run (schema at
``scripts/train.py:473-500``): ``model_state``/``model_kwargs`` for the
generator, ``d_obj_state``/``d_obj_kwargs`` and ``d_img_state``/
``d_img_kwargs`` for the discriminators, plus args/vocab/history.  Stripped
checkpoints (``scripts/strip_checkpoint.py:56-58``) keep only
``['args', 'model_state', 'model_kwargs']`` (+ discriminator pairs).  Both
layouts are accepted here, tolerating:

- the historic ``'module.'`` DataParallel prefix (``scripts/train.py:168-171``),
- deprecated model kwargs (``scripts/strip_old_args.py:31-35`` — the model
  itself just warns and ignores them, ``sg2im/model.py:41-42``),
- the dead ``PatchDiscriminator.classifier`` parameters
  (``sg2im/discriminators.py:40``, never used in forward),
- ``num_batches_tracked`` BN counters.

Weight-layout transforms: Linear ``(out, in)`` -> ``(in, out)`` kernels;
Conv2d OIHW -> HWIO; BatchNorm weight/bias -> scale/bias plus running stats
into the ``batch_stats`` collection (under the ``bn`` submodule of our
BatchNorm wrapper).  Name mapping relies on the ``layer{torch_idx}``
convention of ``sg2im_tpu.nn.layers``.
"""

from __future__ import annotations

import numpy as np

DEPRECATED_MODEL_KWARGS = (
    # scripts/strip_old_args.py:31-35
    "vec_noise_dim",
    "gconv_mode",
    "box_anchor",
    "decouple_obj_predictions",
)


def _to_np(t):
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def strip_module_prefix(state_dict):
    """Drop historic DataParallel 'module.' prefixes (train.py:168-171)."""
    return {
        (k[7:] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_leaf(params, batch_stats, flax_path, leaf, tensor, state_dict,
                  torch_prefix):
    """Place one torch tensor into the flax trees with layout transforms."""
    arr = _to_np(tensor).astype(np.float32)
    is_bn = (
        leaf in ("running_mean", "running_var")
        or (leaf in ("weight", "bias")
            and f"{torch_prefix}.running_mean" in state_dict)
    )
    if leaf == "num_batches_tracked":
        return
    if is_bn:
        bn_path = list(flax_path) + ["bn"]
        if leaf == "weight":
            _set(params, bn_path + ["scale"], arr)
        elif leaf == "bias":
            _set(params, bn_path + ["bias"], arr)
        elif leaf == "running_mean":
            _set(batch_stats, bn_path + ["mean"], arr)
        else:
            _set(batch_stats, bn_path + ["var"], arr)
        return
    if leaf == "weight":
        if arr.ndim == 4:  # Conv OIHW -> HWIO
            _set(params, list(flax_path) + ["kernel"],
                 np.transpose(arr, (2, 3, 1, 0)))
        elif arr.ndim == 2:
            _set(params, list(flax_path) + ["kernel"], arr.T)
        else:
            raise ValueError(
                f"Unexpected weight rank {arr.ndim} at {torch_prefix}"
            )
    elif leaf == "bias":
        _set(params, list(flax_path) + ["bias"], arr)
    else:
        raise ValueError(f"Unexpected leaf '{leaf}' at {torch_prefix}")


def _map_generator_path(parts):
    """Torch generator param path -> flax module path (sans leaf).

    Returns None to drop the key.  ``parts`` excludes the leaf name.
    """
    if not parts:
        return []
    head = parts[0]
    if head in ("obj_embeddings", "pred_embeddings"):
        return [head]
    if head == "gconv":
        if len(parts) == 1:  # nn.Linear path (gconv_num_layers == 0)
            return ["gconv"]
        return ["gconv", parts[1], f"layer{parts[2]}"]
    if head == "gconv_net":
        # gconv_net.gconvs.{k}.net{1,2}.{i}
        _, _, k, net, i = parts
        return ["gconv_net", f"gconvs_{k}", net, f"layer{i}"]
    if head in ("box_net", "rel_aux_net", "mask_net"):
        return [head, f"layer{parts[1]}"]
    if head == "refinement_net":
        if parts[1] == "refinement_modules":
            # refinement_net.refinement_modules.{k}.net.{i}
            _, _, k, _, i = parts
            return ["refinement_net", f"refinement_modules_{k}", f"layer{i}"]
        if parts[1] == "output_conv":
            return ["refinement_net", f"output_conv_{parts[2]}"]
    raise ValueError(f"Unmapped generator param path: {'.'.join(parts)}")


def _map_patch_d_path(parts):
    if parts[0] == "classifier":  # dead code, discriminators.py:40-45
        return None
    if parts[0] == "cnn":
        if len(parts) >= 4 and parts[2] == "net":
            # ResidualBlock sublayers: cnn.{i}.net.{j} -> cnn/layer{i}/layer{j}
            return ["cnn", f"layer{parts[1]}", f"layer{parts[3]}"]
        return ["cnn", f"layer{parts[1]}"]
    raise ValueError(f"Unmapped PatchDiscriminator path: {'.'.join(parts)}")


def _map_ac_d_path(parts):
    # AcCropDiscriminator: discriminator.{cnn.0.{i} | cnn.2 |
    #                      real_classifier | obj_classifier}
    assert parts[0] == "discriminator", parts
    rest = parts[1:]
    if rest[0] == "cnn":
        if rest[1] == "0":
            if len(rest) >= 5 and rest[3] == "net":
                # ResidualBlock: cnn.0.{i}.net.{j}
                return ["discriminator", "cnn_0", f"layer{rest[2]}",
                        f"layer{rest[4]}"]
            return ["discriminator", "cnn_0", f"layer{rest[2]}"]
        if rest[1] == "2":
            return ["discriminator", "cnn_2"]
    if rest[0] in ("real_classifier", "obj_classifier"):
        return ["discriminator", rest[0]]
    raise ValueError(f"Unmapped AcCropDiscriminator path: {'.'.join(parts)}")


_EMBED_LEAVES = {"obj_embeddings", "pred_embeddings"}


def convert_state_dict(state_dict, path_mapper):
    """Convert a torch state_dict into flax {'params', 'batch_stats'}."""
    state_dict = strip_module_prefix(state_dict)
    params: dict = {}
    batch_stats: dict = {}
    for key, tensor in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        torch_prefix = ".".join(parts[:-1])
        flax_path = path_mapper(parts[:-1])
        if flax_path is None:
            continue
        if len(flax_path) == 1 and flax_path[0] in _EMBED_LEAVES:
            _set(params, flax_path + ["embedding"],
                 _to_np(tensor).astype(np.float32))
            continue
        _convert_leaf(params, batch_stats, flax_path, leaf, tensor,
                      state_dict, torch_prefix)
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def convert_generator_state(state_dict):
    return convert_state_dict(state_dict, _map_generator_path)


def convert_patch_discriminator_state(state_dict):
    return convert_state_dict(state_dict, _map_patch_d_path)


def convert_ac_discriminator_state(state_dict):
    return convert_state_dict(state_dict, _map_ac_d_path)


def clean_model_kwargs(model_kwargs):
    """Drop deprecated kwargs; split out vocab; normalize tuples."""
    kw = dict(model_kwargs)
    for k in DEPRECATED_MODEL_KWARGS:
        kw.pop(k, None)
    vocab = kw.pop("vocab", None)
    if "image_size" in kw:
        kw["image_size"] = tuple(kw["image_size"])
    if "refinement_dims" in kw:
        kw["refinement_dims"] = tuple(kw["refinement_dims"])
    return kw, vocab


def load_reference_checkpoint(path):
    """torch.load a reference .pt checkpoint (full or stripped layouts)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def convert_checkpoint(ckpt_or_path):
    """Convert a reference checkpoint into a bundle:

    {
      'model_kwargs': generator constructor kwargs (vocab removed),
      'vocab': vocab dict,
      'generator': {'params': ..., 'batch_stats': ...},
      'd_obj': {...} | None, 'd_obj_kwargs': ... | None,
      'd_img': {...} | None, 'd_img_kwargs': ... | None,
      'args': training args dict | None,
    }
    """
    ckpt = (load_reference_checkpoint(ckpt_or_path)
            if isinstance(ckpt_or_path, str) else ckpt_or_path)
    kwargs, vocab = clean_model_kwargs(ckpt["model_kwargs"])
    if vocab is None:
        vocab = ckpt.get("vocab")
    out = {
        "model_kwargs": kwargs,
        "vocab": vocab,
        "generator": convert_generator_state(ckpt["model_state"]),
        "args": ckpt.get("args"),
        "d_obj": None,
        "d_obj_kwargs": None,
        "d_img": None,
        "d_img_kwargs": None,
    }
    if ckpt.get("d_obj_state"):
        out["d_obj"] = convert_ac_discriminator_state(ckpt["d_obj_state"])
        dk = dict(ckpt.get("d_obj_kwargs") or {})
        dk.pop("vocab", None)
        out["d_obj_kwargs"] = dk
    if ckpt.get("d_img_state"):
        out["d_img"] = convert_patch_discriminator_state(ckpt["d_img_state"])
        out["d_img_kwargs"] = dict(ckpt.get("d_img_kwargs") or {})
    return out


# ---------------------------------------------------------------------------
# Reverse conversion: flax variables -> reference torch state_dict.
# ---------------------------------------------------------------------------

def _flatten_tree(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten_tree(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _flax_path_to_torch(path):
    """Invert the layer{i} naming back to torch dotted names."""
    parts = []
    for p in path:
        if p.startswith("layer"):
            parts.append(p[len("layer"):])
        elif p.startswith("gconvs_"):
            parts.extend(["gconvs", p.split("_")[1]])
        elif p.startswith("refinement_modules_"):
            parts.extend(["refinement_modules", p.rsplit("_", 1)[1], "net"])
        elif p.startswith("output_conv_"):
            parts.extend(["output_conv", p.rsplit("_", 1)[1]])
        elif p == "cnn_0":
            parts.extend(["cnn", "0"])
        elif p == "cnn_2":
            parts.extend(["cnn", "2"])
        elif p == "bn":
            continue  # our BatchNorm wrapper level; torch has none
        else:
            parts.append(p)
    return parts


def convert_variables_to_torch_state(variables):
    """Flax {'params', 'batch_stats'} -> reference torch state_dict
    (inverse of convert_*_state; Linear/Conv layouts transposed back).

    Produces CPU float32 torch tensors keyed exactly as the reference
    modules expect, so ``load_state_dict`` round-trips.
    """
    import torch

    state = {}
    params = _flatten_tree(variables.get("params", {}))
    stats = _flatten_tree(variables.get("batch_stats", {}))

    for path, arr in params.items():
        arr = np.asarray(arr, np.float32)
        leaf = path[-1]
        torch_parts = _flax_path_to_torch(path[:-1])
        base = ".".join(torch_parts)
        if leaf == "embedding":
            state[f"{base}.weight"] = torch.from_numpy(arr.copy())
        elif leaf == "kernel":
            if arr.ndim == 4:  # HWIO -> OIHW
                state[f"{base}.weight"] = torch.from_numpy(
                    np.transpose(arr, (3, 2, 0, 1)).copy())
            else:
                state[f"{base}.weight"] = torch.from_numpy(arr.T.copy())
        elif leaf == "scale":
            state[f"{base}.weight"] = torch.from_numpy(arr.copy())
        elif leaf == "bias":
            state[f"{base}.bias"] = torch.from_numpy(arr.copy())
        else:
            raise ValueError(f"unknown param leaf {leaf} at {path}")
    for path, arr in stats.items():
        arr = np.asarray(arr, np.float32)
        leaf = path[-1]
        base = ".".join(_flax_path_to_torch(path[:-1]))
        if leaf == "mean":
            state[f"{base}.running_mean"] = torch.from_numpy(arr.copy())
        elif leaf == "var":
            state[f"{base}.running_var"] = torch.from_numpy(arr.copy())
        else:
            raise ValueError(f"unknown stat leaf {leaf} at {path}")
    return state


def export_torch_checkpoint(path, generator_variables, model_kwargs, vocab,
                            args=None):
    """Write a reference-layout ``.pt`` checkpoint loadable by the upstream
    ``Sg2ImModel(**model_kwargs).load_state_dict(model_state)`` pattern
    (``scripts/run_model.py:56-58``)."""
    import torch

    kw = dict(model_kwargs, vocab=vocab)
    # TPU-only kwargs (e.g. compute_dtype, a jnp dtype object) would make
    # the .pt unreadable without jax installed and are meaningless to the
    # upstream Sg2ImModel — drop them.
    kw.pop("compute_dtype", None)
    kw.pop("crn_mode", None)
    ckpt = {
        "model_state": convert_variables_to_torch_state(generator_variables),
        "model_kwargs": kw,
        "args": dict(args or {}),
    }
    torch.save(ckpt, path)
    return path
