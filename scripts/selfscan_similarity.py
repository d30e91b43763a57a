"""All-pairs similarity self-scan vs the reference checkout.

Compares every non-test .py file in this repo against every .py file
in /root/reference with difflib.SequenceMatcher — all pairs, so
renamed copies cannot hide behind filenames. Prints every pair above
the report floor and exits nonzero if any real file exceeds the
copy threshold the round driver uses (0.6).

Interface parity (descriptor DSLs, TSV log contracts, flag names) IS
the spec and produces scores around 0.25-0.35 between entirely
different implementations; the 0.6 threshold is far above that band.
"""

import difflib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")

REPORT_FLOOR = 0.35
FAIL_THRESHOLD = 0.6


def source_files(root, skip_tests):
    for p in sorted(root.rglob("*.py")):
        parts = p.relative_to(root).parts
        if skip_tests and (parts[0] == "tests" or ".claude" in parts):
            continue
        yield p


def main():
    ours = [(p, p.read_text(errors="replace"))
            for p in source_files(REPO, skip_tests=True)]
    theirs = [(p, p.read_text(errors="replace"))
              for p in source_files(REF, skip_tests=False)]
    print(f"{len(ours)} repo files x {len(theirs)} reference files")

    failures = []
    for op, otext in ours:
        best = (0.0, None)
        for tp, ttext in theirs:
            m = difflib.SequenceMatcher(None, otext, ttext)
            # cheap upper bounds before the quadratic ratio
            if m.real_quick_ratio() < REPORT_FLOOR or \
                    m.quick_ratio() < REPORT_FLOOR:
                continue
            r = m.ratio()
            if r > best[0]:
                best = (r, tp)
        if best[1] is not None:
            rel_o = op.relative_to(REPO)
            rel_t = best[1].relative_to(REF)
            empty = not otext.strip()
            tag = " (empty file)" if empty else ""
            print(f"{best[0]:.3f}  {rel_o}  ~  {rel_t}{tag}")
            if best[0] >= FAIL_THRESHOLD and not empty and \
                    op.name != "__about__.py":
                failures.append((best[0], rel_o, rel_t))

    if failures:
        print(f"\nFAIL: {len(failures)} file(s) >= {FAIL_THRESHOLD}")
        sys.exit(1)
    print(f"\nOK: no real file >= {FAIL_THRESHOLD}")


if __name__ == "__main__":
    main()
