#!/usr/bin/env python3
"""Plan-regression gate (X-Q13): diff a Verify run's plans.json against
the committed canonical PLANS.json.

    sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out'
    python3 tools/plancheck.py /tmp/verify_out [PLANS.json]

Exit 0 when every query's normalized physical-plan fingerprint matches
the ledger; exit 1 listing added / removed / CHANGED queries otherwise.

Intentional-diff workflow: when a plan change is deliberate (new
operator spelling, optimizer upgrade), re-run Verify, READ the diff this
tool prints, then `cp <outDir>/plans.json PLANS.json` and commit it with
the change named in the message. An unacknowledged diff is a regression.
"""
import json
import sys


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    ledger_path = sys.argv[2] if len(sys.argv) > 2 else "PLANS.json"
    with open(f"{out_dir}/plans.json") as f:
        got = json.load(f)
    try:
        with open(ledger_path) as f:
            want = json.load(f)
    except FileNotFoundError:
        print(f"no ledger at {ledger_path}; seed it with: "
              f"cp {out_dir}/plans.json {ledger_path}")
        return 1

    added = sorted(set(got) - set(want))
    removed = sorted(set(want) - set(got))
    changed = sorted(k for k in set(got) & set(want) if got[k] != want[k])

    # a filtered Verify run only dumps a subset; queries absent from the
    # run are "not checked", not "removed" — only flag removals when the
    # run looks complete (>= 90% of the ledger present)
    partial = len(got) < 0.9 * len(want)
    if partial and removed:
        print(f"(partial run: {len(got)}/{len(want)} queries; "
              "absent queries not treated as removals)")
        removed = []

    for name in added:
        print(f"ADDED    {name} (new query: commit the regenerated ledger)")
    for name in removed:
        print(f"REMOVED  {name} (query gone: regenerate the ledger if intended)")
    for name in changed:
        print(f"CHANGED  {name}")
        print(f"  ledger: {want[name]}")
        print(f"  run:    {got[name]}")

    ok = not (added or removed or changed)
    checked = len(set(got) & set(want)) - len(changed)
    print(f"{checked} plans match, {len(changed)} changed, "
          f"{len(added)} added, {len(removed)} removed")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
