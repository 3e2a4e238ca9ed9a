"""Port the HED (network-bsds500.pth, lllyasviel/ControlNet annotator)
checkpoint to the flax HED net (joligen_tpu/utils/hed.py; reference
models/modules/sketch_generation/hed.py).

Run on a machine WITH the checkpoint:

    python tools/port_hed_weights.py network-bsds500.pth out.npz

then drop into ``$JOLIGEN_TPU_WEIGHTS_DIR/hed_bsds500.npz``.
"""

import sys

import numpy as np

# torch module name -> (flax block, conv indices inside the Sequential)
_VGG_SEQS = [("netVggOne", 0, (0, 2)), ("netVggTwo", 1, (1, 3)),
             ("netVggThr", 2, (1, 3, 5)), ("netVggFou", 3, (1, 3, 5)),
             ("netVggFiv", 4, (1, 3, 5))]
_SCORES = ["netScoreOne", "netScoreTwo", "netScoreThr", "netScoreFou",
           "netScoreFiv"]


def map_state_dict(sd):
    out = {}
    for tname, bi, idxs in _VGG_SEQS:
        for ci, li in enumerate(idxs):
            out[f"vgg{bi}c{ci}.kernel"] = np.transpose(
                sd[f"{tname}.{li}.weight"], (2, 3, 1, 0))
            out[f"vgg{bi}c{ci}.bias"] = sd[f"{tname}.{li}.bias"]
    for bi, tname in enumerate(_SCORES):
        out[f"score{bi}.kernel"] = np.transpose(
            sd[f"{tname}.weight"], (2, 3, 1, 0))
        out[f"score{bi}.bias"] = sd[f"{tname}.bias"]
    out["combine.kernel"] = np.transpose(
        sd["netCombine.0.weight"], (2, 3, 1, 0))
    out["combine.bias"] = sd["netCombine.0.bias"]
    return out


def main(src, dst):
    import torch

    sd = torch.load(src, map_location="cpu")
    # the published checkpoint uses "module*" prefixes (reference hed.py:108)
    sd = {k.replace("module", "net"): v.numpy() for k, v in sd.items()}
    np.savez(dst, **map_state_dict(sd))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(*sys.argv[1:3])
