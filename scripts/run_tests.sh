#!/usr/bin/env bash
# CI test orchestrator (reference scripts/run_tests.sh): schema/doc smoke,
# topic-help smoke per topic, then the pytest suite on the 8-device CPU mesh.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== options doc generation (schema smoke) =="
python scripts/generate_doc.py /tmp/joligen_tpu_docs

echo "== topic help smoke =="
export JAX_PLATFORMS=cpu
for topic in G D data train dataaug alg_gan alg_cut alg_palette \
             alg_diffusion alg_cm alg_sc alg_b2b alg_mat f_s cls tpu; do
  python train.py --help "$topic" > /dev/null
  echo "  --help $topic OK"
done

echo "== pytest =="
# Fast lane (no torch-parity / slow e2e; measured budget in pytest.ini):
#   JOLIGEN_TEST_LANE=fast scripts/run_tests.sh
if [ "${JOLIGEN_TEST_LANE:-full}" = "fast" ]; then
  python -m pytest tests/ -x -q -m "not parity and not slow" "$@"
else
  python -m pytest tests/ -x -q "$@"
fi
