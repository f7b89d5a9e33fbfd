#!/usr/bin/env bash
# Build + query an index via spark-submit --py-files (the north-rule
# deployment shape; on a real cluster replace --master local[*] with the
# cluster master and size executors/shuffle partitions accordingly).
set -euo pipefail
cd "$(dirname "$0")/.."

CPUS="${SPARK_GRAFT_CPUS:-32}"
INPUT="${1:?usage: spark_submit_build.sh <transcripts.parquet> <out_dir> [query]}"
OUT="${2:?out dir}"
QUERY="${3:-spark merge window}"

rm -f /tmp/pss.zip
zip -qr /tmp/pss.zip planet_search_spark

SUBMIT="$(python3 - <<'EOF'
import pyspark, os
print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))
EOF
)"

"$SUBMIT" \
  --master "local[$CPUS]" \
  --conf spark.sql.shuffle.partitions="$CPUS" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --py-files /tmp/pss.zip \
  scripts/cli_main.py build --input "$INPUT" --out "$OUT" --groups 2

"$SUBMIT" \
  --master "local[$CPUS]" \
  --conf spark.sql.shuffle.partitions="$CPUS" \
  --conf spark.sql.session.timeZone=UTC \
  --py-files /tmp/pss.zip \
  scripts/cli_main.py search --index "$OUT" --query "$QUERY" -k 10
