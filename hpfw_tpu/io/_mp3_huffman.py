"""MPEG-1 Layer III Huffman tables (ISO/IEC 11172-3 Table B.7).

Seed version: only table 1 and the count1 tables are populated (enough to
bootstrap the transform-chain validation ladder); the full set is
recovered empirically from the system reference decoder by
tools/recover_mp3_huffman.py, which rewrites this module with the
complete, probe-certified tables.
"""

from __future__ import annotations

# Big-values tables: id -> (linbits, {bitstring: (x, y)}).
# Pair sign bits follow the codeword (x sign first); |15| adds linbits.
BIG_VALUE_TABLES: dict[int, tuple[int, dict[str, tuple[int, int]]]] = {
    0: (0, {}),  # table 0: no data, all zeros
    1: (0, {"1": (0, 0), "001": (0, 1), "01": (1, 0), "000": (1, 1)}),
}

# count1 tables: quadruples (v, w, x, y); sign bit per nonzero value.
COUNT1_TABLES: dict[int, dict[str, tuple[int, int, int, int]]] = {
    # Table B is the fixed 4-bit code: codeword = bitwise NOT of (v w x y).
    1: {format(15 ^ q, "04b"): ((q >> 3) & 1, (q >> 2) & 1,
                                (q >> 1) & 1, q & 1)
        for q in range(16)},
    # Table A (seed guess; replaced by the probe-recovered version).
    0: {"1": (0, 0, 0, 0)},
}


def tree(table: dict[str, tuple]) -> dict:
    """Prefix-code dict -> binary tree of nested dicts; leaves are values."""
    root: dict = {}
    for code, val in table.items():
        node = root
        for b in code[:-1]:
            node = node.setdefault(int(b), {})
            assert isinstance(node, dict), f"prefix clash at {code}"
        last = int(code[-1])
        assert last not in node, f"duplicate code {code}"
        node[last] = val
    return root
