"""Checkpoint interop with the reference's torch ``.pth`` state dicts.

Every reference checkpoint (``cls.pth``, ``mat.pth``, ``dn.pth``, ``G.pth``,
``G_epoch_<n>.pth`` — ``src/main_pretrain.py:105``, ``src/main_warmup.py:77``,
``src/main_optimize.py:148``) can be imported into this framework's params,
and our params can be exported to state dicts loadable by the reference
modules. Key layout / transposition notes:

- torch ``Linear.weight`` is (out, in); flax ``Dense.kernel`` is (in, out).
- torch ``LSTM`` packs gates (i, f, g, o) in ``weight_ih_l0`` (4H, in) /
  ``weight_hh_l0`` (4H, H) with two bias vectors; our LSTMCell uses the same
  gate order with Dense ``ih``/``hh`` (kernel transposed).
- torch ``Conv2d.weight`` is (out_ch, in_ch, kh, kw); flax ``Conv.kernel`` is
  (*window, in, out). The reference's TextCNN convs have in_ch=1 and kw = the
  full embedding width; RelGAN's have kw=8 slices.
- torch MHA packs ``in_proj_weight`` as [q; k; v] rows; ours is one Dense
  with a (d, 3d) kernel.

Requires torch only inside these functions (torch-cpu is available in the
image, but the training path never imports it).
"""

from __future__ import annotations

import numpy as np


def _t(x):  # flax kernel -> torch linear weight
    return np.asarray(x).T


def _conv(x):  # flax (k, in, out) -> torch (out, 1, k, in)
    return np.asarray(x).transpose(2, 0, 1)[:, None, :, :]


def _lstm(prefix_out: str, cell: dict) -> dict:
    return {
        f"{prefix_out}.weight_ih_l0".replace(".weight_ih_l0_rev", ".weight_ih_l0_reverse"): _t(cell["ih"]["kernel"]),
        f"{prefix_out}.bias_ih_l0".replace(".bias_ih_l0_rev", ".bias_ih_l0_reverse"): np.asarray(cell["ih"]["bias"]),
        f"{prefix_out}.weight_hh_l0".replace(".weight_hh_l0_rev", ".weight_hh_l0_reverse"): _t(cell["hh"]["kernel"]),
        f"{prefix_out}.bias_hh_l0".replace(".bias_hh_l0_rev", ".bias_hh_l0_reverse"): np.asarray(cell["hh"]["bias"]),
    }


def _transformer_out(p: dict, torch_prefix: str, n_layers: int = 6) -> dict:
    out = {}
    for i in range(n_layers):
        L = p[f"layer_{i}"]
        pre = f"{torch_prefix}.layers.{i}"
        out[f"{pre}.self_attn.in_proj_weight"] = _t(L["self_attn"]["in_proj"]["kernel"])
        out[f"{pre}.self_attn.in_proj_bias"] = np.asarray(L["self_attn"]["in_proj"]["bias"])
        out[f"{pre}.self_attn.out_proj.weight"] = _t(L["self_attn"]["out_proj"]["kernel"])
        out[f"{pre}.self_attn.out_proj.bias"] = np.asarray(L["self_attn"]["out_proj"]["bias"])
        for lin in ("linear1", "linear2"):
            out[f"{pre}.{lin}.weight"] = _t(L[lin]["kernel"])
            out[f"{pre}.{lin}.bias"] = np.asarray(L[lin]["bias"])
        for norm in ("norm1", "norm2"):
            out[f"{pre}.{norm}.weight"] = np.asarray(L[norm]["scale"])
            out[f"{pre}.{norm}.bias"] = np.asarray(L[norm]["bias"])
    return out


# --------------------------------------------------------------------- export
def generator_to_state_dict(params) -> dict:
    p = params["params"]
    sd = {
        "start_embedding.weight": np.asarray(p["start_embedding"]["embedding"]),
        "token_embedding.weight": np.asarray(p["token_embedding"]["embedding"]),
        "enc_style_embedding.weight": np.asarray(p["enc_style_embedding"]["embedding"]),
        "style_embedding.weight": np.asarray(p["style_embedding"]["embedding"]),
        "transfer.weight": _t(p["transfer"]["kernel"]),
        "fn_1.weight": _t(p["decoder"]["fn_1"]["kernel"]),
        "fn_1.bias": np.asarray(p["decoder"]["fn_1"]["bias"]),
        "fn_2.weight": _t(p["decoder"]["fn_2"]["kernel"]),
    }
    sd.update(_lstm("encoder", p["encoder_fwd"]["cell"]))
    rev = _lstm("encoder", p["encoder_bwd"]["cell"])
    sd.update({k + "_reverse": v for k, v in rev.items()})
    sd.update(_lstm("decoder", p["decoder"]["cell"]))
    return sd


def lm_to_state_dict(params) -> dict:
    p = params["params"]
    sd = {
        "token_embedding.weight": np.asarray(p["token_embedding"]["embedding"]),
        "posit_embedding.weight": np.asarray(p["posit_embedding"]["embedding"]),
        "fwd.weight": _t(p["fwd"]["kernel"]),
        "fwd.bias": np.asarray(p["fwd"]["bias"]),
    }
    sd.update(_transformer_out(p["lm"], "lm"))
    return sd


def matcher_to_state_dict(params) -> dict:
    p = params["params"]
    sd = {
        "token_embedding.weight": np.asarray(p["token_embedding"]["embedding"]),
        "posit_embedding.weight": np.asarray(p["posit_embedding"]["embedding"]),
        "segment_embedding.weight": np.asarray(p["segment_embedding"]["embedding"]),
        "hidden2logits.weight": _t(p["hidden2logits"]["kernel"]),
        "hidden2logits.bias": np.asarray(p["hidden2logits"]["bias"]),
    }
    sd.update(_transformer_out(p["matcher"], "matcher"))
    return sd


def classifier_to_state_dict(params) -> dict:
    p = params["params"]
    sd = {
        "embedding.weight": np.asarray(p["embedding"]["embedding"]),
        "out.weight": _t(p["out"]["kernel"]),
        "out.bias": np.asarray(p["out"]["bias"]),
    }
    for i, k in enumerate((3, 4, 5)):
        sd[f"convs.{i}.weight"] = _conv(p[f"conv_{k}"]["kernel"])
        sd[f"convs.{i}.bias"] = np.asarray(p[f"conv_{k}"]["bias"])
    return sd


def discriminator_to_state_dict(params) -> dict:
    p = params["params"]
    sd = {
        "embeddings.weight": _t(p["embeddings"]),
        "highway.weight": _t(p["highway"]["kernel"]),
        "highway.bias": np.asarray(p["highway"]["bias"]),
        "feature2out.weight": _t(p["feature2out"]["kernel"]),
        "feature2out.bias": np.asarray(p["feature2out"]["bias"]),
        "out2logits.weight": _t(p["out2logits"]["kernel"]),
        "out2logits.bias": np.asarray(p["out2logits"]["bias"]),
    }
    for i, f in enumerate((2, 3, 4, 5)):
        sd[f"convs.{i}.weight"] = _conv(p[f"conv_{f}"]["kernel"])
        sd[f"convs.{i}.bias"] = np.asarray(p[f"conv_{f}"]["bias"])
    return sd


EXPORTERS = {
    "generator": generator_to_state_dict,
    "lm": lm_to_state_dict,
    "matcher": matcher_to_state_dict,
    "classifier": classifier_to_state_dict,
    "discriminator": discriminator_to_state_dict,
}


def save_pth(params, kind: str, path: str) -> None:
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in EXPORTERS[kind](params).items()}
    torch.save(sd, path)


# --------------------------------------------------------------------- import
def state_dict_to_params(sd: dict, template, kind: str):
    """Inverse of the exporters: fill a (mutable dict copy of a) template
    params pytree from a torch state dict."""
    import copy

    import jax

    tree = copy.deepcopy(jax.device_get(template))
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p = tree["params"]
    if kind == "generator":
        p["start_embedding"]["embedding"] = sd["start_embedding.weight"]
        p["token_embedding"]["embedding"] = sd["token_embedding.weight"]
        p["enc_style_embedding"]["embedding"] = sd["enc_style_embedding.weight"]
        p["style_embedding"]["embedding"] = sd["style_embedding.weight"]
        p["transfer"]["kernel"] = sd["transfer.weight"].T
        p["decoder"]["fn_1"]["kernel"] = sd["fn_1.weight"].T
        p["decoder"]["fn_1"]["bias"] = sd["fn_1.bias"]
        p["decoder"]["fn_2"]["kernel"] = sd["fn_2.weight"].T
        for name, tkey in (("encoder_fwd", "encoder"), ("decoder", "decoder")):
            sfx = "" if name != "encoder_bwd" else "_reverse"
            cell = p[name]["cell"]
            cell["ih"]["kernel"] = sd[f"{tkey}.weight_ih_l0{sfx}"].T
            cell["ih"]["bias"] = sd[f"{tkey}.bias_ih_l0{sfx}"]
            cell["hh"]["kernel"] = sd[f"{tkey}.weight_hh_l0{sfx}"].T
            cell["hh"]["bias"] = sd[f"{tkey}.bias_hh_l0{sfx}"]
        cell = p["encoder_bwd"]["cell"]
        cell["ih"]["kernel"] = sd["encoder.weight_ih_l0_reverse"].T
        cell["ih"]["bias"] = sd["encoder.bias_ih_l0_reverse"]
        cell["hh"]["kernel"] = sd["encoder.weight_hh_l0_reverse"].T
        cell["hh"]["bias"] = sd["encoder.bias_hh_l0_reverse"]
    elif kind in ("lm", "matcher"):
        enc_key = "lm" if kind == "lm" else "matcher"
        p["token_embedding"]["embedding"] = sd["token_embedding.weight"]
        p["posit_embedding"]["embedding"] = sd["posit_embedding.weight"]
        if kind == "matcher":
            p["segment_embedding"]["embedding"] = sd["segment_embedding.weight"]
            p["hidden2logits"]["kernel"] = sd["hidden2logits.weight"].T
            p["hidden2logits"]["bias"] = sd["hidden2logits.bias"]
        else:
            p["fwd"]["kernel"] = sd["fwd.weight"].T
            p["fwd"]["bias"] = sd["fwd.bias"]
        i = 0
        while f"{enc_key}.layers.{i}.self_attn.in_proj_weight" in sd:
            L = p[enc_key][f"layer_{i}"]
            pre = f"{enc_key}.layers.{i}"
            L["self_attn"]["in_proj"]["kernel"] = sd[f"{pre}.self_attn.in_proj_weight"].T
            L["self_attn"]["in_proj"]["bias"] = sd[f"{pre}.self_attn.in_proj_bias"]
            L["self_attn"]["out_proj"]["kernel"] = sd[f"{pre}.self_attn.out_proj.weight"].T
            L["self_attn"]["out_proj"]["bias"] = sd[f"{pre}.self_attn.out_proj.bias"]
            for lin in ("linear1", "linear2"):
                L[lin]["kernel"] = sd[f"{pre}.{lin}.weight"].T
                L[lin]["bias"] = sd[f"{pre}.{lin}.bias"]
            for norm in ("norm1", "norm2"):
                L[norm]["scale"] = sd[f"{pre}.{norm}.weight"]
                L[norm]["bias"] = sd[f"{pre}.{norm}.bias"]
            i += 1
    elif kind == "classifier":
        p["embedding"]["embedding"] = sd["embedding.weight"]
        p["out"]["kernel"] = sd["out.weight"].T
        p["out"]["bias"] = sd["out.bias"]
        for i, k in enumerate((3, 4, 5)):
            p[f"conv_{k}"]["kernel"] = sd[f"convs.{i}.weight"][:, 0].transpose(1, 2, 0)
            p[f"conv_{k}"]["bias"] = sd[f"convs.{i}.bias"]
    elif kind == "discriminator":
        p["embeddings"] = sd["embeddings.weight"].T
        for name in ("highway", "feature2out", "out2logits"):
            p[name]["kernel"] = sd[f"{name}.weight"].T
            p[name]["bias"] = sd[f"{name}.bias"]
        for i, f in enumerate((2, 3, 4, 5)):
            p[f"conv_{f}"]["kernel"] = sd[f"convs.{i}.weight"][:, 0].transpose(1, 2, 0)
            p[f"conv_{f}"]["bias"] = sd[f"convs.{i}.bias"]
    else:
        raise ValueError(kind)
    return tree


def load_pth(path: str, template, kind: str):
    import torch

    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    return state_dict_to_params(sd, template, kind)
