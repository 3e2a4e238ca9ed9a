"""Port Segformer MiT backbone weights (HF nvidia/mit-b0 layout) to the
flax MiTBackbone (joligen_tpu/models/modules/segformer.py; reference
models/modules/utils.py:224 downloads the same ImageNet pretrain to init
the segformer G / f_s).

Run on a machine WITH transformers weights access:

    python tools/port_segformer_weights.py                 # nvidia/mit-b0
    python tools/port_segformer_weights.py mit_b0.pth out.npz

then drop into ``$JOLIGEN_TPU_WEIGHTS_DIR/segformer_mit_b0.npz``. The
backbone is trainable — the npz only provides the init, which
load_mit_backbone swaps into any params tree whose nodes are named
``backbone``.
"""

import sys

import numpy as np


def map_state_dict(sd, depths=(2, 2, 2, 2)):
    """HF SegformerModel state dict -> flat '/'-joined MiTBackbone keys."""
    out = {}
    pref = "segformer.encoder." if any(
        k.startswith("segformer.") for k in sd) else "encoder." if any(
        k.startswith("encoder.") for k in sd) else ""

    def g(key):
        return sd[pref + key]

    for si in range(4):
        e = f"patch_embeddings.{si}."
        out[f"embed{si}/proj/kernel"] = np.transpose(
            g(e + "proj.weight"), (2, 3, 1, 0))
        out[f"embed{si}/proj/bias"] = g(e + "proj.bias")
        out[f"embed{si}/norm/scale"] = g(e + "layer_norm.weight")
        out[f"embed{si}/norm/bias"] = g(e + "layer_norm.bias")
        for bi in range(depths[si]):
            p = f"block.{si}.{bi}."
            q = f"s{si}b{bi}/"
            out[q + "ln1/scale"] = g(p + "layer_norm_1.weight")
            out[q + "ln1/bias"] = g(p + "layer_norm_1.bias")
            out[q + "ln2/scale"] = g(p + "layer_norm_2.weight")
            out[q + "ln2/bias"] = g(p + "layer_norm_2.bias")
            out[q + "attn/q/kernel"] = g(p + "attention.self.query.weight").T
            out[q + "attn/q/bias"] = g(p + "attention.self.query.bias")
            # our kv is a single packed Dense: concat key|value on the out dim
            out[q + "attn/kv/kernel"] = np.concatenate(
                [g(p + "attention.self.key.weight").T,
                 g(p + "attention.self.value.weight").T], axis=1)
            out[q + "attn/kv/bias"] = np.concatenate(
                [g(p + "attention.self.key.bias"),
                 g(p + "attention.self.value.bias")])
            out[q + "attn/proj/kernel"] = g(
                p + "attention.output.dense.weight").T
            out[q + "attn/proj/bias"] = g(p + "attention.output.dense.bias")
            if pref + p + "attention.self.sr.weight" in sd:
                out[q + "attn/sr/kernel"] = np.transpose(
                    g(p + "attention.self.sr.weight"), (2, 3, 1, 0))
                out[q + "attn/sr/bias"] = g(p + "attention.self.sr.bias")
                out[q + "attn/sr_norm/scale"] = g(
                    p + "attention.self.layer_norm.weight")
                out[q + "attn/sr_norm/bias"] = g(
                    p + "attention.self.layer_norm.bias")
            out[q + "ffn/fc1/kernel"] = g(p + "mlp.dense1.weight").T
            out[q + "ffn/fc1/bias"] = g(p + "mlp.dense1.bias")
            out[q + "ffn/dw/kernel"] = np.transpose(
                g(p + "mlp.dwconv.dwconv.weight"), (2, 3, 1, 0))
            out[q + "ffn/dw/bias"] = g(p + "mlp.dwconv.dwconv.bias")
            out[q + "ffn/fc2/kernel"] = g(p + "mlp.dense2.weight").T
            out[q + "ffn/fc2/bias"] = g(p + "mlp.dense2.bias")
        out[f"norm{si}/scale"] = g(f"layer_norm.{si}.weight")
        out[f"norm{si}/bias"] = g(f"layer_norm.{si}.bias")
    return out


def main(argv):
    import torch

    if len(argv) <= 1:
        from transformers import SegformerModel
        model = SegformerModel.from_pretrained("nvidia/mit-b0")
        sd = model.state_dict()
        depths = tuple(model.config.depths)
        dst = argv[0] if argv else "segformer_mit_b0.npz"
    else:
        sd = torch.load(argv[0], map_location="cpu")
        depths = (2, 2, 2, 2)
        dst = argv[1]
    sd = {k: np.asarray(v) for k, v in sd.items()}
    np.savez(dst, **map_state_dict(sd, depths))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(sys.argv[1:])
