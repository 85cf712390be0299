"""Build the --py-files zip for spark-submit deployment.

Delegates to gobulk_spark.deploy's shared payload/zip builders — the
runtime self-ship and this CLI must package IDENTICAL code, or the two
deployment paths drift (see deploy.package_payload).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from gobulk_spark.deploy import package_payload, write_zip  # noqa: E402


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "gobulk_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    return write_zip(
        package_payload(os.path.join(REPO, "gobulk_spark")), out_path
    )


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
