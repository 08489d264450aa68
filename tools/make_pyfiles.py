"""Build dist/osmpbf_spark.zip for spark-submit --py-files."""

import os
import shutil
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    staging = tempfile.mkdtemp()
    shutil.copytree(os.path.join(REPO, "osmpbf_spark"),
                    os.path.join(staging, "osmpbf_spark"),
                    ignore=shutil.ignore_patterns("__pycache__"))
    out = shutil.make_archive(os.path.join(dist, "osmpbf_spark"), "zip",
                              staging)
    print(out)


if __name__ == "__main__":
    main()
