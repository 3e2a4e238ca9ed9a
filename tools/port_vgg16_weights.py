"""Port torchvision VGG16 conv weights to the flax perceptual trunk
(joligen_tpu/utils/metrics._VGGish; reference models/vgg_perceptual_loss.py
and models/modules/mat/vggNet.py use torchvision VGG16 features).

Run on a machine WITH the torchvision checkpoint:

    python tools/port_vgg16_weights.py              # downloads via torchvision
    python tools/port_vgg16_weights.py vgg16.pth out.npz

then drop the npz into ``$JOLIGEN_TPU_WEIGHTS_DIR/vgg16_lpips.npz``.

Key contract: ``b{block}c{conv}/kernel`` (HWIO) and ``b{block}c{conv}/bias``
for blocks 0-4 with (2,2,3,3,3) convs per block — the 13 VGG16 conv layers.
When the checkpoint carries the classifier ("classifier.0/.3", i.e. a full
torchvision vgg16), ``fc6/fc7`` keys are also written — the fully-conv
reshape of the FCN8s head (reference classifiers.py:155-175
load_base_weights "surgery"), consumed by VGG16FCN8s.
"""

import sys

import numpy as np

# torchvision vgg16.features conv indices per block
_CONV_IDX = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]


def map_state_dict(sd):
    out = {}
    for bi, convs in enumerate(_CONV_IDX):
        for ci, li in enumerate(convs):
            w = sd[f"features.{li}.weight"]  # OIHW
            b = sd[f"features.{li}.bias"]
            out[f"b{bi}c{ci}/kernel"] = np.transpose(w, (2, 3, 1, 0))
            out[f"b{bi}c{ci}/bias"] = b
    if "classifier.0.weight" in sd:
        # fc -> conv surgery for the FCN8s head: fc6 (4096,25088)->7x7x512,
        # fc7 (4096,4096)->1x1 (reference classifiers.py:155-175)
        fc6 = sd["classifier.0.weight"].reshape(4096, 512, 7, 7)
        out["fc6/kernel"] = np.transpose(fc6, (2, 3, 1, 0))
        out["fc6/bias"] = sd["classifier.0.bias"]
        fc7 = sd["classifier.3.weight"].reshape(4096, 4096, 1, 1)
        out["fc7/kernel"] = np.transpose(fc7, (2, 3, 1, 0))
        out["fc7/bias"] = sd["classifier.3.bias"]
    return out


def main(argv):
    import torch

    if len(argv) <= 1:
        from torchvision.models import vgg16
        sd = vgg16(weights="IMAGENET1K_V1").state_dict()
        dst = argv[0] if argv else "vgg16_lpips.npz"
    else:
        sd = torch.load(argv[0], map_location="cpu")
        dst = argv[1]
    sd = {k: v.numpy() for k, v in sd.items()}
    np.savez(dst, **map_state_dict(sd))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(sys.argv[1:])
