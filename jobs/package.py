"""Build the --py-files bundle: zip the m3spark package for spark-submit."""

from __future__ import annotations

import os
import zipfile


def build(out: str = "m3spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "m3spark")
    out_path = os.path.join(root, out)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for name in files:
                if name.endswith(".py"):
                    full = os.path.join(dirpath, name)
                    z.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    print(build())
