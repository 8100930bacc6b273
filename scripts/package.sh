#!/bin/sh
# Build the --py-files artifact: a zip of the sparkpdf package.
#   sh scripts/package.sh  ->  dist/sparkpdf.zip
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/sparkpdf.zip
python - <<'PY'
import os, zipfile
with zipfile.ZipFile("dist/sparkpdf.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("sparkpdf"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/sparkpdf.zip")
PY
