"""Format-level tests for the pure-Python LMDB implementation
(iisan_tpu/data/lmdbfile.py).

Round-trips exercise the writer+reader pair; the golden tests decode the
produced file with hand-written struct offsets (independent of the
module's own reader helpers) and assert the byte layout liblmdb 0.9
defines: meta page fields, page headers, node packing, overflow chains.
liblmdb itself is absent in this environment (docs/PARITY.md), so these
structural assertions are the strongest available check that the files
are genuine LMDB databases.
"""

import os
import struct

import pytest

from iisan_tpu.data import lmdbfile
from iisan_tpu.data.lmdbfile import (DEFAULT_PSIZE, MDB_MAGIC, P_BRANCH,
                                     P_INVALID, P_LEAF, P_META, P_OVERFLOW,
                                     Error)


def _write(tmp_path, items, name="db.mdb", **kw):
    path = str(tmp_path / name)
    env = lmdbfile.open(path, subdir=False, **kw)
    with env.begin(write=True) as txn:
        for k, v in items.items():
            txn.put(k, v)
    env.close()
    return path


def _read_all(path):
    env = lmdbfile.open(path, subdir=False, readonly=True)
    try:
        return dict(env.begin().cursor().iternext())
    finally:
        env.close()


# ---------------------------------------------------------------------------
# Round-trips
# ---------------------------------------------------------------------------

def test_small_roundtrip_and_order(tmp_path):
    items = {b"banana": b"1", b"apple": b"22", b"cherry": b"3" * 100}
    path = _write(tmp_path, items)
    env = lmdbfile.open(path, subdir=False, readonly=True)
    txn = env.begin()
    for k, v in items.items():
        assert txn.get(k) == v
    assert txn.get(b"missing") is None
    assert txn.get(b"missing", b"dflt") == b"dflt"
    # iteration is key-ordered (B+tree in-order == memcmp order)
    assert [k for k, _ in txn.cursor()] == sorted(items)
    st = env.stat()
    assert st["entries"] == 3 and st["depth"] == 1
    assert st["leaf_pages"] == 1 and st["branch_pages"] == 0
    env.close()


def test_multilevel_tree(tmp_path):
    # ~600 short records do not fit one 4 KB leaf -> real branch level(s)
    items = {f"key{i:05d}".encode(): f"val{i}".encode() for i in range(600)}
    path = _write(tmp_path, items)
    env = lmdbfile.open(path, subdir=False, readonly=True)
    st = env.stat()
    assert st["depth"] >= 2 and st["branch_pages"] >= 1
    assert st["leaf_pages"] > 1 and st["entries"] == 600
    txn = env.begin()
    for k, v in items.items():
        assert txn.get(k) == v
    assert dict(txn.cursor().iternext()) == items
    # seek across leaf boundaries
    cur = txn.cursor()
    assert cur.set_range(b"key00123x") and cur.key() == b"key00124"
    assert cur.set_key(b"key00599") and cur.value() == b"val599"
    assert not cur.set_key(b"key00600")
    env.close()


def test_overflow_values(tmp_path):
    # values beyond the node max (2040 for 4 KB pages) spill to overflow
    # pages — the normal case for the image catalogs (~200 KB pickles)
    big = os.urandom(150_000)
    exact_page = b"x" * (DEFAULT_PSIZE - 16)          # fills pages exactly
    items = {b"big": big, b"exact": exact_page, b"small": b"s",
             b"edge": b"y" * 2032}                    # 2044 > nodemax: spills
    path = _write(tmp_path, items)
    env = lmdbfile.open(path, subdir=False, readonly=True)
    st = env.stat()
    assert st["overflow_pages"] >= (150_000 // DEFAULT_PSIZE + 1)
    txn = env.begin()
    assert txn.get(b"big") == big
    assert txn.get(b"exact") == exact_page
    assert txn.get(b"edge") == items[b"edge"]
    assert dict(txn.cursor().iternext()) == items
    env.close()


def test_empty_db(tmp_path):
    path = _write(tmp_path, {})
    env = lmdbfile.open(path, subdir=False, readonly=True)
    assert env.stat()["entries"] == 0
    assert env.begin().get(b"k") is None
    assert list(env.begin().cursor().iternext()) == []
    assert not env.begin().cursor().first()
    env.close()


def test_reopen_append_and_txnid(tmp_path):
    path = _write(tmp_path, {b"a": b"1"})
    env = lmdbfile.open(path, subdir=False)       # read-write on existing
    with env.begin(write=True) as txn:
        assert txn.get(b"a") == b"1"              # prior data materialized
        txn.put(b"b", b"2")
        assert txn.delete(b"a")
        assert not txn.delete(b"zz")
    env.close()
    assert _read_all(path) == {b"b": b"2"}
    # txnid advanced past the first commit (readers pick the newest meta)
    env = lmdbfile.open(path, subdir=False, readonly=True)
    assert env._tree.meta.txnid >= 2
    env.close()


def test_commit_batching_like_builder(tmp_path):
    """The build_lmdb pattern: multiple sequential write txns, each
    commit durable; later txns see earlier data."""
    path = str(tmp_path / "batched.mdb")
    env = lmdbfile.open(path, subdir=False)
    txn = env.begin(write=True)
    for i in range(50):
        txn.put(f"k{i:03d}".encode(), str(i).encode())
        if (i + 1) % 20 == 0:
            txn.commit()
            txn = env.begin(write=True)
    txn.commit()
    env.sync()
    env.close()
    got = _read_all(path)
    assert len(got) == 50 and got[b"k049"] == b"49"


def test_key_validation(tmp_path):
    env = lmdbfile.open(str(tmp_path / "k.mdb"), subdir=False)
    txn = env.begin(write=True)
    with pytest.raises(Error, match="bad key size"):
        txn.put(b"", b"v")
    with pytest.raises(Error, match="bad key size"):
        txn.put(b"x" * 512, b"v")
    txn.put(b"x" * 511, b"v")                     # MAXKEYSIZE itself is fine
    txn.commit()
    assert _read_all(str(tmp_path / "k.mdb"))[b"x" * 511] == b"v"


def test_overwrite_flag_and_readonly_guard(tmp_path):
    path = _write(tmp_path, {b"a": b"1"})
    env = lmdbfile.open(path, subdir=False)
    txn = env.begin(write=True)
    assert not txn.put(b"a", b"X", overwrite=False)
    assert txn.put(b"a", b"2")
    txn.commit()
    env.close()
    ro = lmdbfile.open(path, subdir=False, readonly=True)
    with pytest.raises(Error):
        ro.begin(write=True)
    with pytest.raises(Error):
        ro.begin().put(b"c", b"3")
    ro.close()


def test_legacy_shim_file_rejected(tmp_path):
    p = tmp_path / "old.lmdb"
    p.write_bytes(b"IISAN-LMDB-SHIM-v1\n\x80\x04}")
    with pytest.raises(Error, match="legacy pickle-shim"):
        lmdbfile.open(str(p), subdir=False, readonly=True)


def test_fuzz_against_dict_oracle(tmp_path):
    import random

    rng = random.Random(7)
    oracle = {}
    for i in range(300):
        k = bytes(rng.randbytes(rng.randint(1, 40)))
        if not k:
            continue
        size = rng.choice([0, 1, 7, 100, 2039, 2040, 2041, 5000, 60_000])
        oracle[k] = bytes(rng.randbytes(size))
    for k in rng.sample(sorted(oracle), 30):
        del oracle[k]
    path = _write(tmp_path, oracle, name="fuzz.mdb")
    assert _read_all(path) == oracle
    env = lmdbfile.open(path, subdir=False, readonly=True)
    txn = env.begin()
    for k in list(oracle)[:50]:
        assert txn.get(k) == oracle[k]
    probe = sorted(oracle)[len(oracle) // 2]
    cur = txn.cursor()
    assert cur.set_range(probe) and cur.key() == probe
    env.close()


def test_inline_overflow_boundary(tmp_path):
    """Pin liblmdb's exact spill threshold: a node of exactly nodemax
    (2040 for 4 KB pages) stays inline; one byte more goes F_BIGDATA."""
    inline_v = b"a" * 2028                # 8 + 4 + 2028 == 2040 == nodemax
    spill_v = b"b" * 2029                 # one past -> overflow
    path = _write(tmp_path, {b"keyA": inline_v, b"keyB": spill_v})
    env = lmdbfile.open(path, subdir=False, readonly=True)
    st = env.stat()
    assert st["overflow_pages"] == 1      # only keyB spilled (2045 B fits 1pg)
    txn = env.begin()
    assert txn.get(b"keyA") == inline_v and txn.get(b"keyB") == spill_v
    # golden decode of the leaf: keyA inline (flags 0), keyB F_BIGDATA
    raw = open(path, "rb").read()
    leaf_off = 3 * DEFAULT_PSIZE          # overflow page emitted first (pg 2)
    _, _, lflags, lower, _ = struct.unpack_from("<QHHHH", raw, leaf_off)
    assert lflags == P_LEAF and (lower - 16) // 2 == 2
    for i, want_flags in ((0, 0), (1, 0x01)):
        node_ofs = struct.unpack_from("<H", raw, leaf_off + 16 + 2 * i)[0]
        nflags = struct.unpack_from("<H", raw, leaf_off + node_ofs + 4)[0]
        assert nflags == want_flags
    env.close()


def test_abort_discards_writes(tmp_path):
    """Aborted transactions (explicit or via exception) leave no trace —
    real-lmdb semantics, previously violated by the env-level overlay."""
    path = _write(tmp_path, {b"a": b"1"})
    env = lmdbfile.open(path, subdir=False)
    txn = env.begin(write=True)
    txn.put(b"partial", b"x")
    assert txn.delete(b"a")
    txn.abort()
    with pytest.raises(Error, match="already committed/aborted"):
        txn.put(b"more", b"y")
    with env.begin(write=True) as txn2:
        txn2.put(b"b", b"2")
    assert _read_all(path) == {b"a": b"1", b"b": b"2"}
    # exception unwinding a with-block also aborts
    with pytest.raises(ValueError):
        with env.begin(write=True) as txn3:
            txn3.put(b"doomed", b"z")
            raise ValueError("boom")
    env.close()
    assert _read_all(path) == {b"a": b"1", b"b": b"2"}


def test_write_txn_sees_own_writes(tmp_path):
    path = _write(tmp_path, {b"a": b"1", b"c": b"3"})
    env = lmdbfile.open(path, subdir=False)
    txn = env.begin(write=True)
    txn.put(b"b", b"2")
    assert txn.delete(b"c")
    assert txn.get(b"b") == b"2" and txn.get(b"c") is None
    assert not txn.put(b"a", b"X", overwrite=False)   # sees committed too
    # the txn's cursor merges its uncommitted overlay
    assert dict(txn.cursor().iternext()) == {b"a": b"1", b"b": b"2"}
    txn.commit()
    env.close()
    assert _read_all(path) == {b"a": b"1", b"b": b"2"}


def test_cursor_position_semantics(tmp_path):
    """next() on a fresh cursor lands on the first record; an exhausted
    cursor stays exhausted (no silent rewind) — lmdb.Cursor semantics."""
    path = _write(tmp_path, {b"a": b"1", b"b": b"2"})
    env = lmdbfile.open(path, subdir=False, readonly=True)
    cur = env.begin().cursor()
    assert cur.next() and cur.key() == b"a"           # fresh next == first
    assert cur.next() and cur.key() == b"b"
    assert not cur.next()
    assert list(cur.iternext()) == []                 # exhausted stays so
    assert not cur.next()
    cur2 = env.begin().cursor()
    assert list(cur2.iternext()) == [(b"a", b"1"), (b"b", b"2")]
    assert list(cur2.iternext()) == []
    env.close()


def test_truncated_overflow_chain_raises(tmp_path):
    val = os.urandom(30_000)
    path = _write(tmp_path, {b"k": val})
    npages = (16 - 1 + len(val)) // DEFAULT_PSIZE + 1
    raw = open(path, "rb").read()
    # cut the file mid-chain: drop the last two overflow pages
    with open(path, "wb") as f:
        f.write(raw[:(2 + npages - 2) * DEFAULT_PSIZE])
    env = lmdbfile.open(path, subdir=False, readonly=True)
    with pytest.raises(Error, match="truncated|beyond end"):
        env.begin().get(b"k")
    env.close()


def test_readonly_info_reports_meta(tmp_path):
    path = _write(tmp_path, {b"a": b"1"})
    env = lmdbfile.open(path, subdir=False, readonly=True)
    info = env.info()
    assert info["map_size"] >= os.path.getsize(path)
    assert info["last_pgno"] == 2 and info["last_txnid"] == 1
    env.close()


# ---------------------------------------------------------------------------
# Golden structural decode (hand-rolled offsets, liblmdb 0.9 layout)
# ---------------------------------------------------------------------------

def test_meta_page_golden(tmp_path):
    path = _write(tmp_path, {b"kk": b"vv"})
    raw = open(path, "rb").read()
    assert len(raw) % DEFAULT_PSIZE == 0
    for meta_off in (0, DEFAULT_PSIZE):
        pgno, pad, flags, lower, upper = struct.unpack_from("<QHHHH", raw,
                                                            meta_off)
        assert pgno == meta_off // DEFAULT_PSIZE
        assert flags == P_META
        o = meta_off + 16
        magic, version, addr, mapsize = struct.unpack_from("<IIQQ", raw, o)
        assert magic == MDB_MAGIC and version == 1 and addr == 0
        assert mapsize >= len(raw)
        # free-DB slot: md_pad == page size, flags carry NOSUBDIR|INTEGERKEY
        fpad, fflags = struct.unpack_from("<IH", raw, o + 24)
        assert fpad == DEFAULT_PSIZE
        assert fflags & 0x4000 and fflags & 0x08
        free_root = struct.unpack_from("<Q", raw, o + 24 + 40)[0]
        assert free_root == P_INVALID
        # main DB slot
        (_, mflags, depth, branch, leaf, ovfl, entries,
         root) = struct.unpack_from("<IHHQQQQQ", raw, o + 24 + 48)
        assert mflags == 0 and depth == 1 and entries == 1
        assert branch == 0 and leaf == 1 and ovfl == 0
        last_pg, txnid = struct.unpack_from("<QQ", raw, o + 24 + 96)
        assert root == 2 and last_pg == 2 and txnid == 1


def test_leaf_page_golden(tmp_path):
    path = _write(tmp_path, {b"kk": b"vvv"})
    raw = open(path, "rb").read()
    off = 2 * DEFAULT_PSIZE                       # root leaf page
    pgno, pad, flags, lower, upper = struct.unpack_from("<QHHHH", raw, off)
    assert pgno == 2 and flags == P_LEAF
    assert lower == 16 + 2                        # header + one indx slot
    node_ofs = struct.unpack_from("<H", raw, off + 16)[0]
    assert node_ofs == upper
    # node: 8+2+3 = 13 -> EVEN = 14, allocated down from page end
    assert node_ofs == DEFAULT_PSIZE - 14
    lo, hi, nflags, ksize = struct.unpack_from("<HHHH", raw, off + node_ofs)
    assert (lo | (hi << 16)) == 3 and nflags == 0 and ksize == 2
    assert raw[off + node_ofs + 8: off + node_ofs + 13] == b"kkvvv"


def test_overflow_page_golden(tmp_path):
    val = os.urandom(10_000)
    path = _write(tmp_path, {b"k": val})
    raw = open(path, "rb").read()
    # writer emits the overflow chain first (pages 2..), then the leaf
    off = 2 * DEFAULT_PSIZE
    pgno, pad, flags = struct.unpack_from("<QHH", raw, off)
    assert pgno == 2 and flags == P_OVERFLOW
    npages = struct.unpack_from("<I", raw, off + 12)[0]
    assert npages == (16 - 1 + len(val)) // DEFAULT_PSIZE + 1
    assert raw[off + 16: off + 16 + len(val)] == val
    leaf_off = (2 + npages) * DEFAULT_PSIZE
    _, _, lflags, lower, upper = struct.unpack_from("<QHHHH", raw, leaf_off)
    assert lflags == P_LEAF
    node_ofs = struct.unpack_from("<H", raw, leaf_off + 16)[0]
    lo, hi, nflags, ksize = struct.unpack_from("<HHHH", raw,
                                               leaf_off + node_ofs)
    assert nflags == 0x01                          # F_BIGDATA
    assert (lo | (hi << 16)) == len(val) and ksize == 1
    ovf_pgno = struct.unpack_from("<Q", raw, leaf_off + node_ofs + 8 + 1)[0]
    assert ovf_pgno == 2


def test_branch_page_golden(tmp_path):
    items = {f"key{i:05d}".encode(): b"v" * 20 for i in range(400)}
    path = _write(tmp_path, items)
    raw = open(path, "rb").read()
    env = lmdbfile.open(path, subdir=False, readonly=True)
    root = env._tree.root
    st = env.stat()
    assert st["depth"] == 2
    off = root * DEFAULT_PSIZE
    pgno, pad, flags, lower, upper = struct.unpack_from("<QHHHH", raw, off)
    assert pgno == root and flags == P_BRANCH
    nkeys = (lower - 16) // 2
    assert nkeys == st["leaf_pages"]
    # node 0: empty key, child pgno in lo|hi<<16|flags<<32
    n0 = struct.unpack_from("<H", raw, off + 16)[0]
    lo, hi, fl, ksize = struct.unpack_from("<HHHH", raw, off + n0)
    assert ksize == 0
    child0 = lo | (hi << 16) | (fl << 32)
    # child 0 is a leaf whose first key is the global minimum
    c_off = child0 * DEFAULT_PSIZE
    _, _, cflags, clower, _ = struct.unpack_from("<QHHHH", raw, c_off)
    assert cflags == P_LEAF
    first_node = struct.unpack_from("<H", raw, c_off + 16)[0]
    cks = struct.unpack_from("<H", raw, c_off + first_node + 6)[0]
    first_key = raw[c_off + first_node + 8: c_off + first_node + 8 + cks]
    assert first_key == b"key00000"
    # node 1 key == lowest key of child 1 (the separator invariant)
    n1 = struct.unpack_from("<H", raw, off + 18)[0]
    lo1, hi1, fl1, ksize1 = struct.unpack_from("<HHHH", raw, off + n1)
    child1 = lo1 | (hi1 << 16) | (fl1 << 32)
    sep = raw[off + n1 + 8: off + n1 + 8 + ksize1]
    c1_off = child1 * DEFAULT_PSIZE
    fn1 = struct.unpack_from("<H", raw, c1_off + 16)[0]
    cks1 = struct.unpack_from("<H", raw, c1_off + fn1 + 6)[0]
    assert raw[c1_off + fn1 + 8: c1_off + fn1 + 8 + cks1] == sep
    env.close()


def test_every_node_offset_is_even(tmp_path):
    """liblmdb requires 2-byte node alignment; check every ptr on every
    page of a mixed-size DB."""
    import random

    rng = random.Random(3)
    items = {f"n{i:04d}".encode(): bytes(rng.randbytes(rng.randint(0, 300)))
             for i in range(300)}
    path = _write(tmp_path, items)
    raw = open(path, "rb").read()
    for pg in range(2, len(raw) // DEFAULT_PSIZE):
        off = pg * DEFAULT_PSIZE
        _, _, flags, lower, upper = struct.unpack_from("<QHHHH", raw, off)
        if not flags & (P_LEAF | P_BRANCH):
            continue
        assert lower >= 16 and upper <= DEFAULT_PSIZE and lower <= upper
        for i in range((lower - 16) // 2):
            ptr = struct.unpack_from("<H", raw, off + 16 + 2 * i)[0]
            assert ptr % 2 == 0 and upper <= ptr < DEFAULT_PSIZE


def test_non_default_page_size(tmp_path):
    """Real liblmdb files inherit the creating system's page size; the
    reader must take psize from the meta, not assume 4096."""
    from iisan_tpu.data.lmdbfile import write_db

    items = {f"k{i:03d}".encode(): os.urandom(i * 37 % 5000)
             for i in range(1, 120)}
    path = str(tmp_path / "big_pages.mdb")
    write_db(path, items, psize=16384)
    env = lmdbfile.open(path, subdir=False, readonly=True)
    assert env.stat()["psize"] == 16384
    assert dict(env.begin().cursor().iternext()) == items
    env.close()


def test_meta_txnid_election(tmp_path):
    """Readers must pick the meta page with the larger txnid — liblmdb
    alternates meta slots per commit, so the stale slot describes an
    older tree."""
    path = _write(tmp_path, {b"old": b"1"})
    env = lmdbfile.open(path, subdir=False)
    with env.begin(write=True) as txn:
        txn.put(b"new", b"2")
    env.close()
    raw = bytearray(open(path, "rb").read())
    # regress meta page 0 to a STALE txnid (0): reader must elect meta 1
    struct.pack_into("<Q", raw, 16 + 24 + 96 + 8, 0)
    stale = tmp_path / "stale0.mdb"
    stale.write_bytes(bytes(raw))
    env = lmdbfile.open(str(stale), subdir=False, readonly=True)
    assert env.begin().get(b"new") == b"2"
    assert env._tree.meta.txnid == 2
    env.close()
    # corrupt meta 1's magic entirely: reader must fall back to meta 0
    raw2 = bytearray(open(path, "rb").read())
    struct.pack_into("<I", raw2, DEFAULT_PSIZE + 16, 0xDEAD)
    torn = tmp_path / "torn1.mdb"
    torn.write_bytes(bytes(raw2))
    env = lmdbfile.open(str(torn), subdir=False, readonly=True)
    assert env.begin().get(b"new") == b"2"   # meta 0 holds the same tree
    env.close()
