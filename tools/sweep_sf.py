"""Cross-SF oracle sweep (VERDICT r4 ask #8).

Runs the full check_oracle parity gate at every committed scale factor
in ONE process (one Spark session, one DuckDB connection per SF) and
writes a combined log.  Size-dependent bugs only show at particular SFs
— a ±1% quantile band flipped only at sf0.001's n; broadcast gates, the
CC/triangle local-vs-distributed boundary and LSH bucket shapes only
vary at sf0.1 — so the sweep is the release gate, the single-SF run the
dev loop.

Usage:
    python tools/sweep_sf.py                    # all three SFs
    python tools/sweep_sf.py sf0.001 sf0.01     # subset
Exit 1 if any SF has failures.  Log: tools/sweep_sf.log
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SFS = ["sf0.001", "sf0.01", "sf0.1"]
LOG_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sweep_sf.log")


def main() -> int:
    sfs = sys.argv[1:] or DEFAULT_SFS
    import contextlib
    import io

    from tools import check_oracle

    failures: dict[str, int] = {}
    with open(LOG_PATH, "w") as log:
        for sf in sfs:
            sf_dir = sf if os.path.isabs(sf) else f"/root/testdata/{sf}"
            print(f"=== {sf_dir} ===")
            log.write(f"=== {sf_dir} ===\n")
            buf = io.StringIO()
            saved_argv = sys.argv
            sys.argv = ["check_oracle.py", sf_dir]
            try:
                with contextlib.redirect_stdout(buf):
                    rc = check_oracle.main()
            finally:
                sys.argv = saved_argv
            out = buf.getvalue()
            log.write(out + "\n")
            # echo only failures + the tail summary to the console
            for line in out.splitlines():
                if line.startswith("FAIL") or "failures" in line or "green" in line:
                    print(line)
            failures[sf] = rc
    bad = [sf for sf, rc in failures.items() if rc]
    print(f"\nsweep: {'FAIL in ' + ', '.join(bad) if bad else 'all SFs green'}")
    print(f"log: {LOG_PATH}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
