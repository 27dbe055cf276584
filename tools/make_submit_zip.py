"""Package moera_search_spark for `spark-submit --py-files`.

Usage: python tools/make_submit_zip.py [out_dir]  (default: dist/)
"""

from __future__ import annotations

import os
import sys
import zipfile


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "moera_search_spark.zip")
    pkg = os.path.join(repo, "moera_search_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, repo))
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
