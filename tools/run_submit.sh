#!/usr/bin/env bash
# Run the token sketch build via spark-submit --py-files at two cluster
# sizes (N=2 and 4N=8 local cores as the sandbox proxy for N vs 4N
# executors). Usage: tools/run_submit.sh [sequence_table_dir]
set -euo pipefail
cd "$(dirname "$0")/.."

TABLE="${1:-.cache/seqtable/bench_n1440000}"
if [ ! -d "$TABLE" ]; then
    echo "generating bench table..." >&2
    python - <<'EOF'
from bench import bench_table_path
bench_table_path()
EOF
fi

ZIP=.cache/tdigest_spark.zip
mkdir -p .cache
rm -f "$ZIP"
(python - <<EOF
import zipfile, pathlib
z = zipfile.ZipFile("$ZIP", "w")
for p in sorted(pathlib.Path("tdigest_spark").rglob("*.py")):
    z.write(p, str(p))
z.close()
EOF
)

for CORES in 2 8; do
    echo "== spark-submit --master local[$CORES] ==" >&2
    spark-submit --master "local[$CORES]" \
        --conf spark.ui.enabled=false \
        --conf spark.driver.memory=16g \
        --py-files "$ZIP" \
        tools/submit_job.py "$TABLE" 2>/dev/null
done
