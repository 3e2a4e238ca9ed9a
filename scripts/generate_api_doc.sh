#!/bin/bash
# Dump the server's OpenAPI-style option schema to docs
# (reference scripts/generate_api_doc.sh, no uvicorn needed: the schema is
# generated directly from the option registry).
set -e
cd "$(dirname "${BASH_SOURCE[0]}")"/..
DOC_PATH=docs/_static
mkdir -p ${DOC_PATH}
python3 - <<'PY'
import json
from joligen_tpu.options import TrainOptions
schema = TrainOptions().get_schema()
with open("docs/_static/openapi.json", "w") as f:
    json.dump(schema, f, indent=2)
print("wrote docs/_static/openapi.json")
PY
