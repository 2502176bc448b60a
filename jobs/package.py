"""Build reach_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "reach_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(root, "reach_spark")
        for dirpath, _dirnames, filenames in os.walk(pkg):
            for fn in filenames:
                # .yml: the declarative rule files (reach_spark/rules/)
                # must ship with the code
                if fn.endswith((".py", ".yml")):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    print(out)


if __name__ == "__main__":
    main()
