"""One-command round finalization: regenerate the plan audit AND the
oracle-parity ledger at HEAD and commit them as artifact-only commits.

VERDICT r3 next-round #5: the `ORACLE_SELFCHECK.md` commit stamp must
never lag the judged source tree. The only way the stamp can name the
exact judged source is: (1) all source changes committed first (clean
tree enforced here), (2) ledger regenerated, (3) ledger committed as an
artifact-only change. The MD itself records whether the tree was clean
at generation (tools/check_oracle.py), so a stale ledger is visible
from the artifact alone.

VERDICT r12 next-round #2: `PLAN_AUDIT.md` fell one registry query
stale in r12 because it was stamped before the round's last registry
addition. The same ordering discipline now covers it: this script
regenerates the audit at the clean HEAD, FAILS if the audited plan
count differs from the registry count (or any row_py node appears),
and commits it alongside the ledger — plan-audit-last by construction.

Run:  python tools/finalize_round.py
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def sh(*args: str) -> str:
    return subprocess.run(args, capture_output=True, text=True,
                          cwd=ROOT, check=True).stdout.strip()


def main() -> int:
    dirty = sh("git", "status", "--porcelain", "--untracked-files=no")
    if dirty:
        print("Working tree has uncommitted changes — commit source "
              "first, then finalize:\n" + dirty)
        return 1
    head = sh("git", "rev-parse", "--short", "HEAD")

    print(f"Regenerating PLAN_AUDIT.md at clean HEAD {head} ...")
    rc = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "plan_audit.py")],
        cwd=ROOT).returncode
    if rc != 0:
        print(f"plan_audit reported {rc} failures — NOT committing; "
              "fix the flagged plans first.")
        return rc
    import re
    m = re.search(r"(\d+) queries audited",
                  (ROOT / "PLAN_AUDIT.md").read_text())
    audited = int(m.group(1)) if m else -1
    registry = int(sh(sys.executable, "-c",
                      "import __spark_entry__ as m; "
                      "print(len(m.queries()))").splitlines()[-1])
    if audited != registry:
        print(f"PLAN_AUDIT covers {audited} plans but the registry "
              f"has {registry} queries — a registry addition landed "
              "after the audit ran (VERDICT r12 #2). Re-run finalize "
              "after committing ALL registry changes.")
        return 1

    print(f"Regenerating ORACLE_SELFCHECK.md at clean HEAD {head} ...")
    rc = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "check_oracle.py"), "--md"],
        cwd=ROOT).returncode
    if rc != 0:
        print(f"check_oracle reported {rc} failures — NOT committing "
              "the ledger; fix the queries first.")
        return rc
    changed = sh("git", "status", "--porcelain",
                 "ORACLE_SELFCHECK.md", "PLAN_AUDIT.md")
    if not changed:
        print("Ledger and audit unchanged; nothing to commit.")
        return 0
    sh("git", "add", "ORACLE_SELFCHECK.md", "PLAN_AUDIT.md")
    sh("git", "commit", "-m",
       f"Regenerate plan audit + oracle self-check ledger at {head} "
       "(artifact-only)")
    print(f"Committed regenerated artifacts (source state: {head}).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
