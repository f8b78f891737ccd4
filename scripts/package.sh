#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit (north_rule shipping
# mode). Produces dist/python_crawler_spark.zip containing the package.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/python_crawler_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/python_crawler_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted((root / "python_crawler_spark").rglob("*.py")):
        z.write(p, p.as_posix())
print("wrote dist/python_crawler_spark.zip")
EOF
