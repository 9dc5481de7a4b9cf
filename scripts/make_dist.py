"""Build dist/engine.zip for spark-submit --py-files."""

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out = os.path.join(ROOT, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for pkg in ("ocr_proofreader_spark", "oracle", "fixtures"):
            for dirpath, _dirs, files in os.walk(os.path.join(ROOT, pkg)):
                if "__pycache__" in dirpath:
                    continue
                for f in files:
                    if f.endswith((".py", ".txt")):
                        full = os.path.join(dirpath, f)
                        zf.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(main())
