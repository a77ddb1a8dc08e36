"""Convert a reference LMDB dataset (`dataset.py:8-40` layout: keys
'{i:06d}' -> PNG bytes, plus 'length') into a rick-tpu RecordStore.

Conversion is OPTIONAL -- `rick_tpu.data` opens lmdb directories directly
(via the lmdb package when installed, else the stdlib page reader in
`data/lmdb_pure.py`) -- but a one-time conversion gives the mmap'd
RecordStore's zero-copy reads for recurring training runs.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="lmdb -> RecordStore conversion")
    p.add_argument("lmdb_path", type=str, help="lmdb environment directory")
    p.add_argument("out_path", type=str, help="RecordStore directory to create")
    args = p.parse_args(argv)

    from rick_tpu.data.store import RecordStoreWriter, _LmdbStore

    src = _LmdbStore(args.lmdb_path)
    n = len(src)
    with RecordStoreWriter(args.out_path) as w:
        for i in range(n):
            blob = src.get(i)
            if blob is None:
                raise IOError(f"missing key {i:06d} in {args.lmdb_path}")
            w.put(i, bytes(blob))
    src.close()
    print(f"converted {n} records: {args.lmdb_path} -> {args.out_path}")


if __name__ == "__main__":
    main()
