"""Scale-up generator for the scaling probe (verdict r05 item 3).

Produces an sfN directory by replicating the driver's sf0.1 tables M times
with FK-consistent key shifting, so the registry can be benched at 10x the
largest driver-provided SF. The driver testdata itself is read-only
(TESTDATA.md); output goes to a gitignored scratch dir inside the repo.

Replication rules (replica i in 0..M-1, i=0 is the verbatim original):

- Fixed dims `region`/`nation` are copied once (TPC-H keeps them constant
  across SF, and every FK into them must stay valid).
- Scaling tables get key columns shifted by i*stride where stride =
  max(key)+1 in the source, applied consistently on both sides of every FK
  edge (orders.o_custkey moves with customer.c_custkey, lineitem's
  orderkey/partkey/suppkey move with their parents), so referential
  integrity and join fan-outs are preserved exactly.
- `documents.text` gets a deterministic per-replica substitution cipher
  over [a-zA-Z] (replica 0 is the identity; replica i>0 uses a
  Fisher-Yates permutation seeded by i from a fixed LCG): lengths (and
  therefore n_chars) are unchanged, but the token vocabulary is disjoint
  across replicas, so shingle/Jaccard/MinHash pair structure is M copies
  of the original's — pairwise operators scale LINEARLY in M, as a real
  Mx corpus would, instead of quadratically as naive row duplication
  would force (every doc would become an M-clique of near-dups, an
  artifact of the generator rather than the operator). A full permutation
  rather than a Caesar rotation because rotation has period 26: at
  mult>26 replica texts repeat byte-for-byte, and two whole multi-letter
  tokens collide across independent permutations only if the permutations
  agree on every letter in the token (probability ~(1/52)^len).
- `documents` gains a deterministic `url` column derived from the SHIFTED
  doc_id (`_synth_url`, applied after the cipher — URLs are never
  ciphered): every 12 consecutive doc_ids share one canonical resource
  wrapped in per-document cosmetic noise, so ur1's canonicalizer runs at
  corpus volume in scaled dirs with resource count scaling linearly. The
  formula is byte-identical to ur1's inline derivation (unit-pinned), so
  oracle parity holds whether the column is read or derived.
- `embeddings.embedding` gets a small deterministic per-replica,
  per-dimension additive perturbation (<=5e-3) so replicas are distinct
  vectors (no degenerate exact ties in top-k) while neighborhood structure
  stays intact. No RNG state: the offset is a pure function of
  (replica, dim).
- `customer.c_acctbal` shifts by i cents per replica (i/100.00, exact in
  2-decimal space): verbatim copies would make every balance value occur
  EXACTLY M times, so ANY value-blocked operator (record linkage)
  degenerates to M-member blocks — an artifact of duplication, not of
  data volume (real M-times-larger data draws balances independently).
  The i-cent offset removes that degenerate clustering: a replica of THE
  SAME source row never collides with another replica of itself for
  M <= 100. Cross-replica collisions between DIFFERENT source rows whose
  balances differ by exactly (j−i) cents still occur — at the organic
  rate of a dense 2-decimal distribution (measured max (nation, cents)
  block at mult=100: 9 members vs ~100 before) — which is the realistic
  behavior, not a guarantee of global disjointness. Every within-replica
  relation (the +1.00 mutation, value distributions up to a <=$1 shift)
  is preserved.

Usage: python tools/gen_sf.py [--src /root/testdata/sf0.1]
                              [--out .scratch/sf1] [--mult 10]
"""

from __future__ import annotations

import argparse
import os
import string

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

FIXED_DIMS = ("region", "nation")

# table -> key columns shifted by that table's own stride domain.
# Domains: orderkey, custkey, partkey, suppkey, event/user ids, doc/vec ids.
KEY_DOMAINS: dict[str, list[tuple[str, str]]] = {
    "customer": [("c_custkey", "custkey")],
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "lineitem": [
        ("l_orderkey", "orderkey"),
        ("l_partkey", "partkey"),
        ("l_suppkey", "suppkey"),
    ],
    "part": [("p_partkey", "partkey")],
    "supplier": [("s_suppkey", "suppkey")],
    "events": [("event_id", "eventid"), ("user_id", "userid")],
    "documents": [("doc_id", "docid")],
    "embeddings": [("vec_id", "vecid")],
}

# domain -> (table, column) that defines its stride (max+1 in the source).
DOMAIN_SOURCE = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}

LETTERS = string.ascii_lowercase + string.ascii_uppercase

# English letters in descending corpus-frequency order — the "Zipf-ish
# letter prior" for the skewed-alphabet mode.
_FREQ_ORDER = "etaoinshrdlcumwfgypbvkjxqz"


def _cipher_table(i: int, skewed: bool = False) -> dict[int, str]:
    """Deterministic per-replica letter permutation (identity at i=0).

    The upper-case table MIRRORS the lower-case one (up[k] =
    lo[k].upper()) so case-folding commutes with the cipher —
    lower(cipher(t)) == cipher(lower(t)) — exactly as a Caesar rotation
    does; within-replica shingle/Jaccard structure after any case
    normalization is therefore preserved bit-for-bit, and upper->upper
    keeps capitalization ratios intact. Seeded LCG + Fisher-Yates — no
    global RNG state, same table for the same i on every run.

    ``skewed=True`` (r09 verdict item 7) draws the permutation through a
    Zipf-ish letter prior instead of uniformly: source letters are
    assigned in frequency order, each sampling its target WITHOUT
    replacement from the remaining letters with weight 1/rank over the
    frequency-ranked target list. Frequent letters therefore tend to map
    to frequent letters in EVERY replica, so hot tokens ("the", "and")
    collide byte-for-byte across some replica pairs — re-creating the
    heavy-tailed cross-replica block sizes a real M×-larger corpus has
    (shared boilerplate everywhere), which the uniform cipher's disjoint
    vocabularies structurally flatten. This is the stress mode for
    blocking-keyed operators (bl1's ``max_block_size`` guard is the
    defense under test); the uniform mode remains the default because
    pairwise-linear scaling is the right NEUTRAL model for everything
    else.
    """
    if i == 0:
        return str.maketrans("", "")
    state = (i * 2654435761) % (2**32) or 1

    def lcg() -> int:
        nonlocal state
        state = (state * 1103515245 + 12345) % (2**31)
        return state

    if skewed:
        lcg(), lcg()  # warm-up: the raw seed's low bits correlate with i
        remaining = list(_FREQ_ORDER)
        mapping: dict[str, str] = {}
        for src in _FREQ_ORDER:
            # 1/rank² — strong enough that two replicas agree on a hot
            # letter's target with ~40% probability, so 3-letter hot
            # tokens collide byte-for-byte across ~7% of replica pairs
            # (the heavy-tail block stressor); a flatter prior keeps
            # replica vocabularies effectively disjoint and defeats the
            # mode's purpose.
            weights = [1.0 / (r + 1) ** 2 for r in range(len(remaining))]
            total = sum(weights)
            u = (lcg() / 2**31) * total
            acc, idx = 0.0, 0
            for idx, w in enumerate(weights):
                acc += w
                if u < acc:
                    break
            mapping[src] = remaining.pop(idx)
        lo = "".join(mapping[c] for c in string.ascii_lowercase)
    else:
        chars = list(string.ascii_lowercase)
        for k in range(len(chars) - 1, 0, -1):
            j = lcg() % (k + 1)
            chars[k], chars[j] = chars[j], chars[k]
        lo = "".join(chars)
    return str.maketrans(LETTERS, lo + lo.upper())


def _perturb_embeddings(tbl: pa.Table, i: int) -> pa.Table:
    col = tbl.column("embedding").combine_chunks()
    arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
    values = arr.values.to_numpy(zero_copy_only=False).astype(np.float32)
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    # per (replica, dim) offset in [-5e-3, 5e-3]; dim = position within row
    dims = np.concatenate(
        [np.arange(offsets[k + 1] - offsets[k]) for k in range(len(offsets) - 1)]
    )
    noise = (((i * 37 + dims * 13) % 101) - 50).astype(np.float32) * 1e-4
    # from_arrays drops the validity bitmap — re-attach it or NULL
    # embeddings silently become empty lists in replicas i>0 (different
    # null-path behavior than replica 0: [] passes isNotNull, size()=0).
    mask = arr.is_null().to_numpy(zero_copy_only=False) if arr.null_count else None
    new = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(values + noise, type=pa.float32()),
        mask=pa.array(mask) if mask is not None else None,
    )
    idx = tbl.schema.get_field_index("embedding")
    return tbl.set_column(idx, tbl.schema.field(idx), new)


def _synth_url(doc_id: int) -> str:
    """Deterministic messy URL for a document — BYTE-IDENTICAL to the
    Spark Column derivation in ``queryset_nstar._ur1_raw_urls`` and the
    DuckDB twin ``_UR1_RAW_SQL`` (a unit test pins all three together).
    Twelve consecutive doc_ids share one canonical resource
    (rid = doc_id // 12) wrapped in per-document cosmetic noise —
    scheme/TLD case, www. prefix, default ports, trailing slash, tracking
    params, param order, fragments — driven by doc_id residues that vary
    WITHIN each resource group, so resource count scales linearly with the
    corpus and the canonicalizer always has real collapsing to do."""
    rid = doc_id // 12
    dkey = rid % 6
    scheme = "http" if rid % 3 == 0 else "https"
    scheme_raw = scheme.upper() if doc_id % 2 == 0 else scheme
    www = "www." if doc_id % 2 == 1 else ""
    tld = ".co.uk" if dkey == 0 else ".com"
    tld_raw = tld.upper() if doc_id % 3 == 0 else tld
    port = (":80" if scheme == "http" else ":443") if doc_id % 7 == 0 else ""
    slash = "/" if doc_id % 3 == 1 else ""
    qid = f"id={rid % 5}"
    if rid % 5 == 0:
        qcore = f"{qid}&ref=a" if doc_id % 2 == 0 else f"ref=a&{qid}"
    else:
        qcore = qid
    if doc_id % 3 == 0:
        qstr = f"?{qcore}&utm_source=feed"
    elif doc_id % 3 == 1:
        qstr = f"?utm_campaign=c&{qcore}"
    else:
        qstr = f"?{qcore}"
    frag = "#sec1" if doc_id % 6 == 0 else ""
    return f"{scheme_raw}://{www}site{dkey}{tld_raw}{port}/p/{rid}{slash}{qstr}{frag}"


def _with_urls(tbl: pa.Table) -> pa.Table:
    """Set/append the `url` column from the (already shifted) doc_id —
    AFTER the cipher rotation, which must never touch URLs. Scaled dirs
    therefore carry a REAL corpus-volume url column (the driver's
    read-only testdata has none; ur1 derives the identical formula inline
    there)."""
    urls = pa.array(
        [None if d is None else _synth_url(d) for d in tbl.column("doc_id").to_pylist()],
        type=pa.string(),
    )
    if tbl.schema.get_field_index("url") >= 0:
        return tbl.set_column(
            tbl.schema.get_field_index("url"), pa.field("url", pa.string()), urls
        )
    return tbl.append_column(pa.field("url", pa.string()), urls)


def _rotate_documents(tbl: pa.Table, i: int, skewed: bool = False) -> pa.Table:
    texts = tbl.column("text").to_pylist()
    trans = _cipher_table(i, skewed=skewed)
    rotated = pa.array([t.translate(trans) if t is not None else None for t in texts])
    idx = tbl.schema.get_field_index("text")
    return tbl.set_column(idx, tbl.schema.field(idx), rotated)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", ".scratch", "sf1"))
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset of scaling tables to emit (fixed dims "
        "are always copied); default all — used for targeted overflow "
        "probes at high multipliers where the full star is not needed",
    )
    ap.add_argument(
        "--skewed-alphabet",
        action="store_true",
        help="draw document ciphers through a Zipf-ish letter prior so hot "
        "tokens collide across replicas (heavy-tailed cross-replica blocks "
        "— the stress mode for blocking-keyed operators); default uniform "
        "permutations keep replica vocabularies disjoint (pairwise-linear "
        "neutral scaling)",
    )
    args = ap.parse_args()
    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)

    wanted = (
        {t.strip() for t in args.tables.split(",")} if args.tables else set(KEY_DOMAINS)
    )
    unknown = wanted - set(KEY_DOMAINS)
    if unknown:
        raise SystemExit(f"unknown tables: {sorted(unknown)}")
    if "documents" in wanted:
        # The per-replica substitution ciphers must be pairwise distinct,
        # or colliding replicas would be byte-identical text (shifted ids)
        # and every doc would gain cross-replica exact duplicates, making
        # PAIRWISE operators (near-dup, Jaccard, edit distance) scale
        # super-linearly as a generator artifact. Distinctness is expected
        # from the seeded shuffle but not guaranteed by construction, so
        # verify it outright — it is O(mult) dict builds.
        tables = [
            _cipher_table(i, skewed=args.skewed_alphabet)
            for i in range(args.mult)
        ]
        seen = {tuple(sorted(t.items())) for t in tables}
        if len(seen) != args.mult:
            raise SystemExit(
                f"cipher collision: only {len(seen)} distinct permutations "
                f"for mult={args.mult}; pairwise-op scaling would be "
                "contaminated by cross-replica exact duplicates"
            )
    src_tables = {
        name: pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        for name in list(KEY_DOMAINS) + list(FIXED_DIMS)
    }
    strides = {
        dom: pc.max(src_tables[t].column(c)).as_py() + 1
        for dom, (t, c) in DOMAIN_SOURCE.items()
    }

    for name in FIXED_DIMS:
        pq.write_table(src_tables[name], os.path.join(out, f"{name}.parquet"))
        print(f"{name}: copied fixed dim ({src_tables[name].num_rows} rows)")

    for name, keys in KEY_DOMAINS.items():
        if name not in wanted:
            continue
        src = src_tables[name]
        # Stream one replica per row group instead of concat-then-write:
        # at high multipliers (sf10 = 100x lineitem) the concatenated
        # table would hold the whole output uncompressed in RAM; the
        # writer keeps peak memory at one replica regardless of mult.
        out_schema = src.schema
        if name == "documents" and out_schema.get_field_index("url") < 0:
            out_schema = out_schema.append(pa.field("url", pa.string()))
        path = os.path.join(out, f"{name}.parquet")
        with pq.ParquetWriter(path, out_schema) as writer:
            for i in range(args.mult):
                t = src
                for col, dom in keys:
                    idx = t.schema.get_field_index(col)
                    field = t.schema.field(idx)
                    shifted = pc.add(
                        t.column(col), pa.scalar(i * strides[dom], type=field.type)
                    )
                    t = t.set_column(idx, field, shifted.cast(field.type))
                if i > 0 and name == "documents":
                    t = _rotate_documents(t, i, skewed=args.skewed_alphabet)
                if name == "documents":
                    t = _with_urls(t)
                if i > 0 and name == "embeddings":
                    t = _perturb_embeddings(t, i)
                if i > 0 and name == "customer":
                    idx = t.schema.get_field_index("c_acctbal")
                    field = t.schema.field(idx)
                    shifted_bal = pc.add(
                        t.column("c_acctbal"),
                        pa.scalar(i / 100.0, type=field.type),
                    )
                    t = t.set_column(idx, field, shifted_bal.cast(field.type))
                writer.write_table(t.cast(out_schema))
        print(f"{name}: {src.num_rows} -> {src.num_rows * args.mult} rows")


if __name__ == "__main__":
    main()
