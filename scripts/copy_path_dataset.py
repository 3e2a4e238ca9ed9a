"""Materialize a paths.txt-listed dataset into a flat directory tree
(reference scripts/copy_path_dataset.py): copies/links every image and
label referenced by <src>/paths.txt into <dst>, rewriting paths.txt.

    python scripts/copy_path_dataset.py srcdir dstdir [--link]
"""

from __future__ import annotations

import argparse
import os
import shutil


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--link", action="store_true")
    a = p.parse_args()
    os.makedirs(a.dst, exist_ok=True)
    with open(os.path.join(a.src, "paths.txt")) as f:
        lines = [ln.split() for ln in f.read().splitlines() if ln]
    out_lines = []
    root = os.path.dirname(os.path.abspath(a.src))
    for parts in lines:
        new_parts = []
        for part in parts:
            srcp = part if os.path.isabs(part) else os.path.join(root, part)
            if not os.path.exists(srcp):
                new_parts.append(part)   # class ids etc. pass through
                continue
            rel = os.path.basename(part)
            dstp = os.path.join(a.dst, rel)
            if not os.path.exists(dstp):
                if a.link:
                    os.symlink(os.path.abspath(srcp), dstp)
                else:
                    shutil.copy2(srcp, dstp)
            new_parts.append(rel)
        out_lines.append(" ".join(new_parts))
    with open(os.path.join(a.dst, "paths.txt"), "w") as f:
        f.write("\n".join(out_lines) + "\n")
    print(f"wrote {len(out_lines)} entries to {a.dst}")


if __name__ == "__main__":
    main()
