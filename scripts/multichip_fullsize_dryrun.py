"""Round-cadence artifact: FULL-SIZE 8-device dryrun -> MULTICHIP_FULL_r{N}.json.

The driver's per-round dryrun uses reduced depths for CI time; this script
runs ``__graft_entry__.dryrun_multichip(n, full_size=True)`` — production
depths/widths, GSPMD shardings, one executed step — and records the result
beside the driver's ``MULTICHIP_r*.json`` (VERDICT r3 item 7). ~10 min of
XLA CPU compile; run once per round:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/multichip_fullsize_dryrun.py --round 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--round", type=int, required=True)
    parser.add_argument("--devices", type=int, default=8)
    args = parser.parse_args()

    import jax

    import __graft_entry__ as graft

    out = {"n_devices": args.devices, "full_size": True,
           "jax_devices": len(jax.devices()),
           "platform": jax.devices()[0].platform}
    t0 = time.time()
    try:
        graft.dryrun_multichip(args.devices, full_size=True)
        out.update(ok=True, skipped=False)
    except Exception:
        out.update(ok=False, skipped=False, error=traceback.format_exc()[-2000:])
    out["wall_seconds"] = round(time.time() - t0, 1)

    path = os.path.join(REPO, f"MULTICHIP_FULL_r{args.round:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print("wrote", path)
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
