"""Regenerate REGISTRY_FINGERPRINTS.json (the registry change-detection
snapshot — see ``zarr_datafusion_spark.fingerprints``).

Run after ANY change to an entry's implementation, a shared helper, or
an oracle string; ``tests/test_registry_window.py`` pins file ==
computed so a stale snapshot fails the suite.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as E
    from zarr_datafusion_spark import fingerprints as FP

    queries, oracles = E._registries()
    fps = FP.compute_fingerprints(queries, oracles)
    path = os.path.join(FP._REPO_ROOT, FP.FINGERPRINTS_FILE)
    with open(path, "w") as f:
        json.dump(dict(sorted(fps.items())), f, indent=1)
        f.write("\n")
    print(f"wrote {len(fps)} fingerprints to {path}")


if __name__ == "__main__":
    main()
