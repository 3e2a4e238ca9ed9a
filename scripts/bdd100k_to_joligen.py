"""Convert a BDD100K detection/segmentation export to the joliGEN on-disk
layout (reference scripts/bdd100k_to_joligen.py): per-domain trainX/ dirs
with a paths.txt of 'img bbox.txt' lines, bbox files 'cat x1 y1 x2 y2'.

    python scripts/bdd100k_to_joligen.py --bdd_json labels.json \
        --img_dir images/ --out datasets/bdd_joligen --domain A \
        [--categories car person ...] [--time_of_day daytime]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

DEFAULT_CATEGORIES = ["person", "rider", "car", "truck", "bus", "train",
                      "motorcycle", "bicycle", "traffic light",
                      "traffic sign"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bdd_json", required=True,
                   help="BDD100K labels json (list of frames)")
    p.add_argument("--img_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--domain", default="A", choices=["A", "B"])
    p.add_argument("--phase", default="train", choices=["train", "test"])
    p.add_argument("--categories", nargs="*", default=DEFAULT_CATEGORIES)
    p.add_argument("--time_of_day", default="",
                   help="filter frames by attributes.timeofday")
    p.add_argument("--copy_images", action="store_true",
                   help="copy images into the output tree (default: link)")
    a = p.parse_args()

    cat_id = {c: i + 1 for i, c in enumerate(a.categories)}
    with open(a.bdd_json) as f:
        frames = json.load(f)

    base = os.path.join(a.out, f"{a.phase}{a.domain}")
    os.makedirs(os.path.join(base, "imgs"), exist_ok=True)
    os.makedirs(os.path.join(base, "bbox"), exist_ok=True)
    lines = []
    kept = 0
    for fr in frames:
        if a.time_of_day and fr.get("attributes", {}).get(
                "timeofday") != a.time_of_day:
            continue
        name = fr.get("name") or fr.get("videoName")
        src = os.path.join(a.img_dir, name)
        if not os.path.exists(src):
            continue
        boxes = []
        for lab in fr.get("labels", []):
            c = lab.get("category")
            b2 = lab.get("box2d")
            if c not in cat_id or not b2:
                continue
            boxes.append(f"{cat_id[c]} {int(b2['x1'])} {int(b2['y1'])} "
                         f"{int(b2['x2'])} {int(b2['y2'])}")
        if not boxes:
            continue
        img_rel = os.path.join(f"{a.phase}{a.domain}", "imgs", name)
        bbox_rel = os.path.join(f"{a.phase}{a.domain}", "bbox",
                                os.path.splitext(name)[0] + ".txt")
        dst = os.path.join(a.out, img_rel)
        if a.copy_images:
            shutil.copy2(src, dst)
        elif not os.path.exists(dst):
            os.symlink(os.path.abspath(src), dst)
        with open(os.path.join(a.out, bbox_rel), "w") as f:
            f.write("\n".join(boxes) + "\n")
        lines.append(f"{img_rel} {bbox_rel}")
        kept += 1
    with open(os.path.join(base, "paths.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {kept} samples to {base} "
          f"(use with --data_relative_paths and the *_online dataset modes)")


if __name__ == "__main__":
    main()
