"""Dependency-free line + branch coverage via sys.monitoring (PEP 669).

The environment has no pytest-cov/coverage.py and installs are not allowed,
but the CI gate (reference: JaCoCo 90% line / 75% branch floors,
build.gradle:216-230) needs locally-runnable numbers. LINE events record
each (file, line) once and then DISABLE that location — steady-state
overhead near zero. BRANCH events record each (code, offset, destination)
outcome; a branch site is fully covered when BOTH outcomes (taken and
fall-through) were observed. Sites DISABLE after both outcomes, or after a
repetition cap on a single outcome (a heavily-biased branch would otherwise
fire its callback forever; the uncovered outcome is reported as missed
either way).

Executable-line truth comes from compiling each source file and walking the
nested code objects' co_lines() tables — the same universe coverage.py uses.
The branch universe is every conditional-branch instruction (dis opnames
POP_JUMP_IF_* / FOR_ITER) x 2 outcomes. Lines/branches only reachable in
subprocesses (true cross-process tests) count as uncovered here, so both
floors are lower bounds on what pytest-cov would report.

Usage: python tools/coverage_lite.py [--fail-under PCT]
           [--branch-fail-under PCT] [pytest args...]
"""

from __future__ import annotations

import dis
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "vectorsearch_tpu")
TOOL_ID = 4  # sys.monitoring slot (0-5 free for tools; coverage.py uses 3)

# Conditional-branch opcodes (CPython 3.12): both outcomes must be observed
# for full branch coverage of the site. FOR_ITER branches between the loop
# body and exhaustion.
COND_OPS = frozenset({
    "POP_JUMP_IF_FALSE", "POP_JUMP_IF_TRUE",
    "POP_JUMP_IF_NONE", "POP_JUMP_IF_NOT_NONE",
    "FOR_ITER",
})

# run as `python tools/coverage_lite.py`: sys.path[0] is tools/, so the
# package under test would not import inside pytest
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def _walk_code(path: str):
    with open(path, "r") as f:
        src = f.read()
    try:
        code = compile(src, path, "exec")
    except SyntaxError:
        return
    stack = [code]
    while stack:
        co = stack.pop()
        yield co
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)


def executable_lines(path: str) -> set[int]:
    lines: set[int] = set()
    for co in _walk_code(path):
        for _, _, ln in co.co_lines():
            if ln is not None and ln > 0:
                lines.add(ln)
    # compile() marks docstring-only statements and module headers; keep the
    # same universe for hits and totals so the ratio is consistent.
    return lines


def branch_sites(path: str) -> set[tuple[str, int]]:
    """(qualname, offset) of every conditional-branch instruction.

    Excluded: the POP_JUMP_IF_TRUE immediately following WITH_EXCEPT_START —
    the compiler-synthesized ``with``-cleanup check that only executes while
    an exception unwinds through the ``with`` (and whose "suppressed"
    outcome is unreachable for non-suppressing managers like locks). Every
    ``with`` block in the package contributed one permanently-half-covered
    phantom site; JaCoCo's arc analysis does not count these either."""
    sites: set[tuple[str, int]] = set()
    for co in _walk_code(path):
        prev = None
        for instr in dis.get_instructions(co):
            if (
                instr.opname in COND_OPS
                and not (prev is not None
                         and prev.opname == "WITH_EXCEPT_START")
            ):
                sites.add((co.co_qualname, instr.offset))
            prev = instr
    return sites


def branch_site_lines(path: str) -> dict[tuple[str, int], int]:
    """(qualname, offset) -> source line, for the missing-site report
    (COVLITE_MISSING=<file substr>[,<substr>...])."""
    lines: dict[tuple[str, int], int] = {}
    for co in _walk_code(path):
        ln = None
        for instr in dis.get_instructions(co):
            if instr.starts_line is not None:
                ln = instr.starts_line
            if instr.opname in COND_OPS:
                lines[(co.co_qualname, instr.offset)] = ln or 0
    return lines


def main() -> int:
    args = sys.argv[1:]
    fail_under = 0.0
    branch_fail_under = 0.0
    while args and args[0] in ("--fail-under", "--branch-fail-under"):
        if args[0] == "--fail-under":
            fail_under = float(args[1])
        else:
            branch_fail_under = float(args[1])
        args = args[2:]

    hits: dict[str, set[int]] = {}
    # (file, qualname, offset) -> set of destination offsets observed
    bhits: dict[tuple[str, str, int], set[int]] = {}
    bcount: dict[tuple[str, str, int], int] = {}
    REP_CAP = 200
    mon = sys.monitoring

    def on_line(code, line):
        fn = code.co_filename
        if fn.startswith(PKG):
            hits.setdefault(fn, set()).add(line)
        return mon.DISABLE

    def on_branch(code, offset, dest):
        fn = code.co_filename
        if not fn.startswith(PKG):
            return mon.DISABLE
        key = (fn, code.co_qualname, offset)
        outcomes = bhits.setdefault(key, set())
        outcomes.add(dest)
        if len(outcomes) >= 2:
            return mon.DISABLE
        n = bcount.get(key, 0) + 1
        bcount[key] = n
        if n >= REP_CAP:  # biased site: stop paying the callback
            return mon.DISABLE
        return None

    mon.use_tool_id(TOOL_ID, "coverage_lite")
    mon.register_callback(TOOL_ID, mon.events.LINE, on_line)
    mon.register_callback(TOOL_ID, mon.events.BRANCH, on_branch)
    mon.set_events(TOOL_ID, mon.events.LINE | mon.events.BRANCH)

    import pytest

    rc = pytest.main(args or ["tests/", "-q"])

    mon.set_events(TOOL_ID, 0)
    mon.free_tool_id(TOOL_ID)

    if os.environ.get("COVLITE_DEBUG"):
        print("RAW:", len(hits), sum(len(v) for v in hits.values()),
              list(hits)[:3])
    total_exec = total_hit = 0
    total_br = total_br_hit = 0
    rows = []
    for dirpath, _dirs, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            ex = executable_lines(path)
            if not ex:
                continue
            h = hits.get(path, set()) & ex
            total_exec += len(ex)
            total_hit += len(h)
            sites = branch_sites(path)
            br = 2 * len(sites)
            br_hit = 0
            for (qn, off) in sites:
                br_hit += min(2, len(bhits.get((path, qn, off), ())))
            total_br += br
            total_br_hit += br_hit
            rows.append((os.path.relpath(path, ROOT), len(h), len(ex),
                         br_hit, br))
            want = os.environ.get("COVLITE_MISSING", "")
            if want and any(s and s in path for s in want.split(",")):
                site_lines = branch_site_lines(path)
                missed = sorted(
                    (site_lines.get((qn, off), 0), qn, off,
                     len(bhits.get((path, qn, off), ())))
                    for (qn, off) in sites
                    if len(bhits.get((path, qn, off), ())) < 2
                )
                for ln, qn, off, got in missed:
                    print(f"MISS {os.path.relpath(path, ROOT)}:{ln} "
                          f"{qn} ({got}/2)")

    print(f"\n{'file':<52} {'hit':>6} {'exec':>6} {'pct':>7} "
          f"{'br':>9} {'brpct':>7}")
    for name, h, ex, bh, br in rows:
        bp = 100.0 * bh / br if br else 100.0
        print(f"{name:<52} {h:>6} {ex:>6} {100.0 * h / ex:>6.1f}% "
              f"{bh:>4}/{br:<4} {bp:>6.1f}%")
    pct = 100.0 * total_hit / max(total_exec, 1)
    bpct = 100.0 * total_br_hit / max(total_br, 1)
    print(f"{'TOTAL':<52} {total_hit:>6} {total_exec:>6} {pct:>6.1f}% "
          f"{total_br_hit:>4}/{total_br:<4} {bpct:>6.1f}%")
    if rc != 0:
        return rc
    if pct < fail_under:
        print(f"FAIL: line coverage {pct:.1f}% < floor {fail_under}%")
        return 2
    if bpct < branch_fail_under:
        print(f"FAIL: branch coverage {bpct:.1f}% < floor {branch_fail_under}%")
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
