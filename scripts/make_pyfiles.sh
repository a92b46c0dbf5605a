#!/bin/sh
# Package the engine for spark-submit --py-files (north rule packaging).
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/splade_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/splade_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("splade_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("dist/splade_spark.zip written")
EOF
