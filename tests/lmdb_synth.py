"""Independent synthetic LMDB writer for testing the pure-Python reader.

Constructs byte-valid LMDB environments from the published liblmdb 0.9
on-disk layout (64-bit): meta pages, branch/leaf B+tree pages, overflow
chains.  Written from the struct definitions in mdb.c -- deliberately NOT
sharing code with rick_tpu/data/lmdb_pure.py, so the two implementations
cross-check each other.  (The lmdb package itself is unavailable in this
environment; this is the documented residual-risk stand-in for real files.)
"""

from __future__ import annotations

import struct

PSIZE = 4096
PAGEHDR = 16
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
INVALID = 0xFFFFFFFFFFFFFFFF


def _page_header(pgno, flags, lower, upper):
    return struct.pack("<QHHHH", pgno, 0, flags, lower, upper)


def _overflow_header(pgno, npages):
    # overflow pages store the page count where lower/upper would be
    return struct.pack("<QHHI", pgno, 0, P_OVERFLOW, npages)


def _leaf_page(pgno, nodes):
    """nodes: list of (key, data_bytes_or_(ovf_pgno,size)). Keys must be sorted."""
    blobs = []
    for key, data in nodes:
        if isinstance(data, tuple):  # bigdata
            ovf_pgno, size = data
            nd = struct.pack("<HHHH", size & 0xFFFF, size >> 16, F_BIGDATA, len(key))
            nd += key + struct.pack("<Q", ovf_pgno)
        else:
            size = len(data)
            nd = struct.pack("<HHHH", size & 0xFFFF, size >> 16, 0, len(key))
            nd += key + data
        if len(nd) % 2:
            nd += b"\0"  # lmdb keeps nodes 2-byte aligned
        blobs.append(nd)
    # pack nodes from the top of the page downward, ptrs in key order
    offsets = []
    upper = PSIZE
    for nd in reversed(blobs):
        upper -= len(nd)
    cur = upper
    body = bytearray(PSIZE - PAGEHDR)
    ptr_area = len(blobs) * 2
    for nd in blobs:
        offsets.append(cur)
        body[cur - PAGEHDR : cur - PAGEHDR + len(nd)] = nd
        cur += len(nd)
    lower = PAGEHDR + ptr_area
    page = bytearray(_page_header(pgno, P_LEAF, lower, upper))
    page += body
    struct.pack_into(f"<{len(offsets)}H", page, PAGEHDR, *offsets)
    return bytes(page[:PSIZE])


def _branch_page(pgno, entries):
    """entries: list of (key, child_pgno); first key conventionally empty."""
    blobs = []
    for key, child in entries:
        nd = struct.pack(
            "<HHHH", child & 0xFFFF, (child >> 16) & 0xFFFF, (child >> 32) & 0xFFFF,
            len(key),
        )
        nd += key
        if len(nd) % 2:
            nd += b"\0"
        blobs.append(nd)
    offsets = []
    upper = PSIZE
    for nd in blobs:
        upper -= len(nd)
    cur = upper
    body = bytearray(PSIZE - PAGEHDR)
    for nd in blobs:
        offsets.append(cur)
        body[cur - PAGEHDR : cur - PAGEHDR + len(nd)] = nd
        cur += len(nd)
    lower = PAGEHDR + len(blobs) * 2
    page = bytearray(_page_header(pgno, P_BRANCH, lower, upper))
    page += body
    struct.pack_into(f"<{len(offsets)}H", page, PAGEHDR, *offsets)
    return bytes(page[:PSIZE])


def _meta_page(pgno, root, entries, depth, last_pg, txnid):
    db_free = struct.pack("<IHHQQQQQ", PSIZE, 0, 0, 0, 0, 0, 0, INVALID)
    db_main = struct.pack("<IHHQQQQQ", 0, 0, depth, 0, 1, 0, entries, root)
    meta = struct.pack("<II", 0xBEEFC0DE, 1)
    meta += struct.pack("<QQ", 0, 10 * 1024 * 1024)  # address, mapsize
    meta += db_free + db_main
    meta += struct.pack("<QQ", last_pg, txnid)
    page = _page_header(pgno, P_META, 0, 0) + meta
    return page + b"\0" * (PSIZE - len(page))


def write_synth_lmdb(path: str, kv: dict, *, force_branch: bool = False) -> None:
    """Write {key: value} (bytes->bytes) as an LMDB data.mdb at `path`
    (a directory).  Values larger than ~1KB go to overflow pages.  With
    enough keys (or force_branch) a two-level tree is emitted."""
    import os

    os.makedirs(path, exist_ok=True)
    items = sorted(kv.items())
    pages = {}  # pgno -> bytes (may span multiple for overflow)
    next_pg = 2  # 0, 1 are meta

    # assign overflow chains first
    resolved = []
    for k, v in items:
        if len(v) > 1024:
            npages = -(-(PAGEHDR + len(v)) // PSIZE)
            pg = next_pg
            chain = bytearray(_overflow_header(pg, npages))
            chain += v
            chain += b"\0" * (npages * PSIZE - len(chain))
            pages[pg] = bytes(chain)
            next_pg += npages
            resolved.append((k, (pg, len(v))))
        else:
            resolved.append((k, v))

    # split into leaves (~12 nodes per leaf when forcing a branch)
    per_leaf = 12 if (force_branch or len(resolved) > 100) else len(resolved) or 1
    leaves = [resolved[i : i + per_leaf] for i in range(0, len(resolved), per_leaf)] or [[]]
    leaf_pgnos = []
    for group in leaves:
        pg = next_pg
        pages[pg] = _leaf_page(pg, group)
        leaf_pgnos.append((group[0][0] if group else b"", pg))
        next_pg += 1

    if len(leaf_pgnos) == 1:
        root, depth = leaf_pgnos[0][1], 1
    else:
        pg = next_pg
        entries = [(b"", leaf_pgnos[0][1])] + [(k, p) for k, p in leaf_pgnos[1:]]
        pages[pg] = _branch_page(pg, entries)
        root, depth = pg, 2
        next_pg += 1

    blob = bytearray()
    blob += _meta_page(0, root, len(items), depth, next_pg - 1, txnid=1)
    blob += _meta_page(1, root, len(items), depth, next_pg - 1, txnid=2)
    pos = 2
    for pg in sorted(pages):
        assert pg == pos, (pg, pos)
        blob += pages[pg]
        pos += len(pages[pg]) // PSIZE
    with open(os.path.join(path, "data.mdb"), "wb") as f:
        f.write(bytes(blob))
