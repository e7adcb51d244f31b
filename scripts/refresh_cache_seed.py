#!/usr/bin/env python
"""Curate benchmarks/compile_cache_seed/ from the live compile cache.

The live persistent-executable cache (benchmarks/compile_cache/, gitignored)
kills the 3-930 s remote-compile lottery for THIS checkout, but the driver
benches a clean checkout where the ignored dir is empty — so the big bench
executables must ride git.  This script copies the bench-critical entries
(by jit-name prefix, size-gated so PRNG-init junk stays out) from the live
cache into the tracked seed dir, replacing stale same-prefix entries whose
key no longer exists live (a code change produced a new HLO).

Run it after any healthy-rig bench run that followed a change to the
serving/model path, then commit the seed dir.  Round-5 diagnosis showed
the cache key is stable across processes/sessions, so a committed entry
keeps hitting until the traced program itself changes.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# jit-name prefixes of the driver-visible bench programs:
#   serve_chain   — bench.py's chained serving program
#   mfu_probe     — bench.py's MFU cost-analysis probe
#   pixels_chain  — bench_pixels.py's chained pixels program
# (names are deliberately unique — a 'jit__lambda-' prefix would match
# every script's lambdas in the shared live cache)
SEED_PREFIXES = ("jit_serve_chain-", "jit_mfu_probe-", "jit_pixels_chain-")
MIN_BYTES = 1 << 20          # ignore sub-MB entries (init/PRNG programs)


def refresh(cache_dir: str, seed_dir: str, *, log=print) -> int:
    """Copy live entries matching SEED_PREFIXES into seed_dir.

    REPLACEMENT semantics for staleness: a seed entry is dropped only
    when a live entry with the SAME jit-name prefix but a different key
    exists (the program changed and produced its successor).  Mere
    absence from the live cache is NOT staleness — the live dir may have
    been cleared, or this session may simply not have run that bench —
    and deleting a still-valid committed seed would silently reintroduce
    the 700-930 s compile lottery.  Returns the seed entry count."""
    if not os.path.isdir(cache_dir):
        log(f"no live cache at {cache_dir}; nothing to do")
        return 0
    os.makedirs(seed_dir, exist_ok=True)
    live = {n for n in os.listdir(cache_dir)
            if n.endswith("-cache")
            and n.startswith(SEED_PREFIXES)
            and os.path.getsize(os.path.join(cache_dir, n)) >= MIN_BYTES}
    for name in sorted(live):
        src = os.path.join(cache_dir, name)
        dst = os.path.join(seed_dir, name)
        if (not os.path.exists(dst)
                or os.path.getsize(dst) != os.path.getsize(src)):
            shutil.copy2(src, dst)
            log(f"seeded {name} "
                f"({os.path.getsize(src) / 1e6:.1f} MB)")

    def prefix_of(name: str) -> str:
        for p in SEED_PREFIXES:
            if name.startswith(p):
                return p
        return ""

    live_by_prefix = {prefix_of(n) for n in live}
    removed = 0
    for name in sorted(os.listdir(seed_dir)):
        if (name.endswith("-cache") and prefix_of(name)
                and name not in live
                and prefix_of(name) in live_by_prefix):
            os.unlink(os.path.join(seed_dir, name))
            log(f"dropped stale seed {name} (replaced by a newer "
                f"{prefix_of(name)}* entry)")
            removed += 1
    n = len([x for x in os.listdir(seed_dir) if x.endswith("-cache")])
    log(f"seed dir holds {n} entries "
        f"({sum(os.path.getsize(os.path.join(seed_dir, x)) for x in os.listdir(seed_dir)) / 1e6:.1f} MB)"
        f" — commit benchmarks/compile_cache_seed/ if it changed")
    return n


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cache-dir",
                    default=os.path.join(_REPO, "benchmarks",
                                         "compile_cache"))
    ap.add_argument("--seed-dir",
                    default=os.path.join(_REPO, "benchmarks",
                                         "compile_cache_seed"))
    args = ap.parse_args()
    refresh(args.cache_dir, args.seed_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
