"""Auto-generate the options documentation from the parser schema
(reference scripts/generate_doc.py, run in CI as a schema smoke test).

    python scripts/generate_doc.py [out_dir]

Writes ``docs/options.md`` with every flag grouped by topic.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from joligen_tpu.options import TrainOptions  # noqa: E402
from joligen_tpu.options.registry import split_key  # noqa: E402


def main(out_dir):
    reg = TrainOptions()
    os.makedirs(out_dir, exist_ok=True)
    by_topic = {}
    for name, spec in sorted(reg.registry.items()):
        by_topic.setdefault(split_key(name)[0], []).append((name, spec))

    lines = ["# joliGEN-TPU options", "",
             "Auto-generated from the option registry "
             "(`scripts/generate_doc.py`). Flat CLI flags map 1:1 to nested "
             "JSON config keys by prefix.", ""]
    for topic in sorted(by_topic):
        lines.append(f"## {topic}")
        lines.append("")
        lines.append("| flag | type | default | help |")
        lines.append("|---|---|---|---|")
        for name, spec in by_topic[topic]:
            default = spec.get("default")
            ty = spec.get("type", "str")
            hlp = (spec.get("help", "") or "").replace("|", "\\|")
            if spec.get("choices"):
                hlp += f" [choices: {', '.join(map(str, spec['choices']))}]"
            lines.append(f"| `--{name}` | {ty} | `{default}` | {hlp} |")
        lines.append("")
    path = os.path.join(out_dir, "options.md")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}: {sum(len(v) for v in by_topic.values())} options, "
          f"{len(by_topic)} topics")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "docs"))
