"""Prune checkpoint files from a training directory, keeping selected
epochs/iters and 'latest' (reference scripts/rm_checkpoints.py — same CLI)."""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", type=str, default="",
                   help="path to checkpoints directory")
    p.add_argument("--preserved_epoch", type=str, default=[], nargs="*",
                   help="epoch numbers whose weights to keep")
    p.add_argument("--preserved_iter", type=str, default=[], nargs="*",
                   help="iteration numbers whose weights to keep")
    p.add_argument("--verbose", action="store_true")
    opt = p.parse_args()

    file_types = (".pt", ".pth", ".onnx", ".pkl")
    preserved = set(opt.preserved_epoch) | {
        "iter_" + it for it in opt.preserved_iter} | {"latest"}

    removed = 0
    for fn in sorted(os.listdir(opt.checkpoint_dir)):
        if not fn.endswith(file_types):
            continue
        # names: {epoch|latest|iter_N}_net_{name}.pth / {prefix}_optim.pkl
        prefix = fn.split("_net_")[0].split("_optim")[0]
        if prefix in preserved:
            continue
        path = os.path.join(opt.checkpoint_dir, fn)
        if opt.verbose:
            print("removing", path)
        os.remove(path)
        removed += 1
    print(f"removed {removed} checkpoint files from {opt.checkpoint_dir}")


if __name__ == "__main__":
    main()
