#!/usr/bin/env python
"""Regenerate docs/SETTINGS_PARITY.md from settings_closure.py and
verify the closure over the reference's spelled setting names.

Scans /root/reference/clickhouse-arrow/src for setting names at
add_setting/with_setting call sites and the ArrowOptions field names
(client/options.rs), then asserts each extracted name has an explicit
disposition row. Exits non-zero listing any uncovered name.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference/clickhouse-arrow/src"

#: identifiers that appear in setting-shaped call sites but are
#: placeholders/test scaffolding, not settings (settings.rs unit tests
#: use "key"/"custom_key" to exercise the CUSTOM flag encoding)
_NOT_SETTINGS = {
    "key", "custom_key", "custom_setting", "critical_setting",
    "important_custom", "special_value", "custom_value", "value",
}


def scan_reference() -> set[str]:
    names: set[str] = set()
    call_re = re.compile(
        r"(?:add_setting|with_setting)\s*\(\s*\"([a-z][a-z0-9_]*)\"")
    tuple_re = re.compile(r"\(\s*\"([a-z][a-z0-9_]{5,})\"\s*(?:\.to_string\(\)\s*)?,\s*(?:true|false|\d|\")")
    for root, _dirs, files in os.walk(REF):
        for fn in files:
            if not fn.endswith(".rs"):
                continue
            text = open(os.path.join(root, fn), encoding="utf-8",
                        errors="replace").read()
            for m in call_re.finditer(text):
                names.add(m.group(1))
            # from-tuple scanning only in settings.rs: elsewhere the
            # ("name", value) shape is Enum8 variants / host:port pairs
            if fn == "settings.rs":
                for m in tuple_re.finditer(text):
                    names.add(m.group(1))
    # ArrowOptions field names are settings in the reference's
    # with_setting(&str) dispatch (client/options.rs:598-602)
    opt = open(os.path.join(REF, "client/options.rs"),
               encoding="utf-8").read()
    m = re.search(r"pub struct ArrowOptions \{(.*?)\}", opt, re.S)
    if m:
        for fm in re.finditer(r"pub ([a-z0-9_]+):", m.group(1)):
            names.add(fm.group(1))
    return {n for n in names if n not in _NOT_SETTINGS}


def main() -> int:
    from clickhouse_arrow_spark.settings_closure import (
        DISPOSITIONS,
        REFERENCE_SPELLED,
        render_markdown,
    )

    scanned = scan_reference()
    missing_rows = sorted(n for n in scanned if n not in DISPOSITIONS)
    missing_spelled = sorted(n for n in scanned
                             if n not in REFERENCE_SPELLED)
    out = os.path.join(os.path.dirname(__file__), "..",
                       "docs", "SETTINGS_PARITY.md")
    with open(out, "w", encoding="utf-8") as f:
        f.write(render_markdown())
    print(f"scanned {len(scanned)} reference-spelled setting names: "
          f"{sorted(scanned)}")
    print(f"wrote {os.path.normpath(out)} "
          f"({len(DISPOSITIONS)} explicit rows)")
    if missing_rows:
        print(f"UNCOVERED (no disposition row): {missing_rows}")
        return 1
    if missing_spelled:
        print(f"note: scanned names missing from REFERENCE_SPELLED "
              f"(update the frozenset): {missing_spelled}")
        return 1
    print("closure OK: every scanned name has an explicit disposition")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
