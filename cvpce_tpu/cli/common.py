"""Shared CLI helpers: weight loading for GLN/embedder from either torch
reference checkpoints or our orbax checkpoints."""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.embedders import MACVGG
from ..models.gln import GLN, GLNConfig


def default_gln_config(fast: bool = False) -> GLNConfig:
    """Inference config: exact postprocess by default; `fast` enables the
    TPU speed path (bf16 conv stacks, Pallas NMS, approximate per-level
    top-k) at fp-tolerance cost."""
    on_tpu = jax.default_backend() not in ("cpu",)
    if fast:
        return GLNConfig(compute_dtype="bfloat16" if on_tpu else "float32",
                         use_pallas_nms=on_tpu, use_approx_topk=on_tpu)
    return GLNConfig(use_pallas_nms=on_tpu)


def load_gln_variables(weights: Optional[str], config: GLNConfig) -> Dict:
    """Build GLN variables: random init, a reference torch checkpoint
    (cvpce/proposals_eval.py:9-17 analogue), or an orbax checkpoint
    directory saved by our training loop."""
    import os

    model = GLN(config=config, train=False)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, config.canvas_h, config.canvas_w, 3), jnp.float32))
    if weights is None:
        return variables
    if os.path.isdir(weights):
        return _load_gln_orbax(weights, config, variables)
    from ..utils.torch_import import import_gln, load_state_dict

    sd = load_state_dict(weights)
    imported = import_gln(sd)
    return _merge(variables, imported)


def _load_gln_orbax(ckpt_dir: str, config: GLNConfig, variables: Dict
                    ) -> Dict:
    """Restore model variables from an orbax directory: a training-run
    dir (rotating ``checkpoint``), a params-only serving export
    (pipeline/serving.py), or a bare checkpoint node saved by
    train/checkpoint.py. All restores are raw (template-free), so the
    training run's optimizer config is irrelevant here."""
    from os import path

    from ..pipeline.serving import SERVING_NAME, load_gln_variables

    d = path.normpath(ckpt_dir)
    if (path.exists(path.join(d, SERVING_NAME))
            or path.exists(path.join(d, "checkpoint"))):
        restored = load_gln_variables(d)
    else:
        # bare checkpoint node (e.g. .../epoch_87 or .../checkpoint itself)
        restored = load_gln_variables(path.dirname(d),
                                      name=path.basename(d))
    # Overlay onto the config-built init template: a checkpoint with a
    # mismatched head (different class count, canvas-dependent shapes)
    # fails HERE with a clear shape/key message instead of a cryptic
    # apply-time error (ADVICE r3).
    return _merge(variables, restored)


def load_embedder(weights: Optional[str], batch_norm: bool = True,
                  encoder: str = "vgg16", int8: bool = False,
                  resnet_layers=(2, 3)):
    """Returns (encoder_fn, embedding_size).

    encoder='vgg16': MACVGG; accepts torchvision vgg16(_bn) or reference
    MACVGG checkpoints. encoder='resnet50': MACResNet; accepts torchvision
    resnet50 state_dicts (cvpce/cli/dihe.py:257-309 offers both trunks).
    int8: calibrated static-scale int8 MXU serving path for either
    trunk (same checkpoints; ~1.4x embed throughput on v5e at small
    embedding-fidelity cost): the Classifier calibrates on the gallery
    at index-build time (scales persist with saved indexes); standalone
    use self-calibrates on the first batch.

    BN checkpoints serve with the BatchNorms folded into the convs
    (fold_bn_variables — exact at eval, removes the unfused BN
    bandwidth passes; PERF.md r2 layer profile).
    """
    if encoder == "resnet50":
        return _load_macresnet(weights, int8=int8,
                               resnet_layers=resnet_layers)
    dtype = jnp.bfloat16 if int8 else jnp.float32
    model = MACVGG(batch_norm=batch_norm, train=False, int8_all=int8,
                   int8_static=int8, dtype=dtype)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32))
    if weights is not None and os.path.isdir(weights):
        # DIHE serving export / training-run dir (pipeline/serving.py):
        # encoder params + BN stats, restored template-free
        from ..pipeline.serving import load_dihe_encoder

        enc_params, enc_stats = load_dihe_encoder(weights)
        variables = _merge(variables, {"params": enc_params,
                                       "batch_stats": enc_stats})
    elif weights is not None:
        from ..utils.torch_import import (import_vgg16_features,
                                          load_state_dict)

        sd = load_state_dict(weights)
        if any(k.startswith("features.") for k in sd):
            imported = import_vgg16_features(sd, batch_norm=batch_norm)
        elif any(k.startswith("block1.") for k in sd):
            # reference MACVGG checkpoint: block1/block2 are Sequential
            # SLICES of vgg.features (classification.py:36-37), so their
            # module indices restart at 0; block2 really starts at the
            # original feature index cutoff_1 (33 with BN, 23 without)
            offset = 33 if batch_norm else 23
            remapped = {}
            for k, v in sd.items():
                if k.startswith("block1."):
                    remapped["features." + k[len("block1."):]] = v
                elif k.startswith("block2."):
                    rest = k[len("block2."):]
                    idx, tail = rest.split(".", 1)
                    remapped[f"features.{int(idx) + offset}.{tail}"] = v
            imported = import_vgg16_features(remapped, batch_norm=batch_norm)
        else:
            raise ValueError("unrecognized embedder checkpoint layout")
        variables = _merge(variables, imported)

    from ..models.embedders import EmbedFn, fold_bn_variables

    if batch_norm:
        variables = fold_bn_variables(variables)
        model = MACVGG(batch_norm=False, train=False, int8_all=int8,
                       int8_static=int8, dtype=dtype)
    encode = EmbedFn(model, variables)
    return encode, model.embedding_size


def _load_macresnet(weights: Optional[str], int8: bool = False,
                    resnet_layers=(2, 3)):
    """int8 -> calibrated static-scale int8 trunk convs on a bf16 base
    (models/quant.py; same lifecycle as the MACVGG path — the
    Classifier calibrates on the gallery and persists scales with the
    index). `resnet_layers`: reference descriptor_layers
    (cvpce/models/classification.py:55, layer l = our stage c(l+1);
    default [2, 3] -> c3+c4 = 1536-d)."""
    from ..models.embedders import EmbedFn, MACResNet

    model = MACResNet(train=False,
                      descriptor_stages=tuple(
                          f"c{l + 1}" for l in resnet_layers),
                      dtype=jnp.bfloat16 if int8 else jnp.float32,
                      quant="static" if int8 else None)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32))
    if weights is not None:
        from ..utils.torch_import import import_resnet50, load_state_dict

        sd = load_state_dict(weights)
        imported = import_resnet50(sd, norm="batch",
                                   flax_prefix=["trunk"])
        variables = _merge(variables, imported)

    encode = EmbedFn(model, variables)
    return encode, model.embedding_size


def _merge(base: Dict, update: Dict) -> Dict:
    """Recursively overlay `update` onto `base`, requiring matching
    shapes and rejecting keys the base template doesn't have — a
    checkpoint from a different architecture must fail loudly at load
    time, not silently leave random-init leaves in place (ADVICE r3)."""
    out = dict(base)
    for k, v in update.items():
        if k not in out:
            raise KeyError(
                f"checkpoint key {k!r} not in the model's init template "
                f"(template keys: {sorted(out)}) — wrong checkpoint for "
                f"this architecture/config?")
        if isinstance(v, dict) and isinstance(out[k], dict):
            out[k] = _merge(out[k], v)
        else:
            if hasattr(out[k], "shape"):
                if np.shape(out[k]) != np.shape(v):
                    raise ValueError(
                        f"shape mismatch for {k}: template "
                        f"{np.shape(out[k])} vs checkpoint {np.shape(v)}")
            out[k] = jnp.asarray(v)
    return out
