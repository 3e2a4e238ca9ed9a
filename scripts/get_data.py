"""Download the joliGEN example datasets (reference util/get_data.py).

This build sandbox has no network egress — run this on a connected machine:

    python scripts/get_data.py horse2zebra --out datasets/
"""

from __future__ import annotations

import argparse
import os
import sys
import tarfile
import urllib.request
import zipfile

DATASETS = {
    "horse2zebra": "https://www.joligen.com/datasets/horse2zebra.zip",
    "noglasses2glasses_ffhq_mini":
        "https://www.joligen.com/datasets/noglasses2glasses_ffhq_mini.zip",
    "online_mario2sonic_lite2":
        "https://www.joligen.com/datasets/online_mario2sonic_lite2.zip",
    "daytime2dawn_dusk_lite":
        "https://www.joligen.com/datasets/daytime2dawn_dusk_lite.zip",
    "mnist2USPS": "https://www.joligen.com/datasets/mnist2USPS.zip",
    "bdd100K_vid": "https://www.joligen.com/datasets/bdd100K_vid.zip",
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("name", choices=sorted(DATASETS))
    p.add_argument("--out", default="datasets")
    a = p.parse_args()
    url = DATASETS[a.name]
    os.makedirs(a.out, exist_ok=True)
    archive = os.path.join(a.out, os.path.basename(url))
    if not os.path.exists(archive):
        print(f"downloading {url} ...")
        try:
            urllib.request.urlretrieve(url, archive)
        except OSError as e:
            sys.exit(f"download failed ({e}); this environment may have no "
                     f"network egress — fetch {url} manually into {a.out}/")
    print(f"extracting {archive}")
    if archive.endswith(".zip"):
        with zipfile.ZipFile(archive) as z:
            z.extractall(a.out)
    else:
        with tarfile.open(archive) as t:
            t.extractall(a.out)
    print("done:", os.path.join(a.out, a.name))


if __name__ == "__main__":
    main()
