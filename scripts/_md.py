"""Shared marker-splice for the bench scripts that own a block of
BENCH/BASELINE.md — one implementation of the BEGIN/END replacement so
crash behavior and half-present-marker handling cannot diverge."""

from __future__ import annotations


def splice_block(md_path: str, tag: str, block: str) -> None:
    begin, end = f"<!-- {tag}:BEGIN -->", f"<!-- {tag}:END -->"
    prev = open(md_path).read()
    if begin in prev and end in prev:
        head = prev.split(begin, 1)[0]
        tail = prev.split(end, 1)[1]
        out = head + block.rstrip("\n") + tail
    else:
        if begin in prev or end in prev:  # half-present: interrupted run
            raise ValueError(
                f"{md_path} has an unmatched {tag} marker — repair it "
                "before re-running"
            )
        out = prev.rstrip("\n") + "\n\n" + block
    with open(md_path, "w") as f:
        f.write(out)
