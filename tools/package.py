"""Build graby_spark.zip for ``spark-submit --py-files`` deployment."""

from __future__ import annotations

import os
import sys
import zipfile


def build(out_path: str = "dist/graby_spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(root, os.path.dirname(out_path)), exist_ok=True)
    target = os.path.join(root, out_path)
    pkg = os.path.join(root, "graby_spark")
    with zipfile.ZipFile(target, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for name in filenames:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(dirpath, name)
                zf.write(full, os.path.relpath(full, root))
    return target


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dist/graby_spark.zip"))
