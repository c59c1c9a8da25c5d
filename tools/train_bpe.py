#!/usr/bin/env python3
"""Offline BPE merge-table trainer for the tx24 tokenizer-apply operator.

Character-level byte-pair-encoding training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" - the
public subword-nmt algorithm, without the end-of-word marker), with the
INCREMENTAL pair-statistics update the published implementation uses:
maintain pair->count and pair->affected-word index; each merge touches
only the words containing the merged pair, so total training cost is
bounded by total merge applications, not O(|vocab| * merges).

TRAINING CORPUS (since round 15): the fixtures' FULL text surface - the
union of every VARCHAR column across the driver tables (prose documents
plus entity names, market segments, order priorities, part names/types,
JSON props), each word weighted by its true row frequency. Rationale,
measured: `documents.text` alone has a CLOSED 31-word vocabulary whose
total merge capacity is 89 merges (the trainer exhausts - every word
becomes a single token), so a realistic-size merge table is impossible
from prose alone; the entity/ID/JSON columns supply the long tail
(digit runs, '#', '{"k":' punctuation) that real corpora have and that
lets training run to thousands of ranks, exactly like GPT-2's digit and
punctuation merges.

TWO VIEWS OF ONE TABLE (prefix property): merges are learned in global
frequency order, so the first N entries of the 2000-merge table are
themselves the exact N-merge table for the same corpus. The generated
artifact therefore carries:
  - Full  : all 2000 merges - realistic table size; used by the
            cross-domain audit (tx29) over entity-name domains where a
            big table is non-degenerate;
  - Band  : the prefix whose fertility over `documents` sits mid-band
            (smallest N with tokens/word <= 1.35; published tokenizers
            land ~1.1-1.6) - the DEFAULT table for the documents-family
            operators (tx24/tx26/tx27/mm10/cur13). Beyond ~N=160 the
            31-word prose vocabulary merges completely (fertility 1.0,
            whitespace-proxy drift 0 everywhere), which would make the
            packing-drift audit vacuous - the fixture bounds the
            DEFAULT table, not the machinery.

The trained table is an ARTIFACT, baked into generated Scala source
(`BpeMerges.scala`): the apply operator (tx24) broadcasts it implicitly
by constant, and the DuckDB twins re-derive it as a VALUES literal from
the same constant. The in-engine Spark trainer (tx28 machinery) must
reproduce `Full` bit-for-bit at N=2000 on the same corpus - the
three-way parity gate asserted by LlmDataSpec.

BYTE MODE (`bytes` as the third arg): the GPT-2-style variant - words
come from the GPT-2-shaped pretokenizer (leading space attaches to the
following token; letters / digits / punctuation split into separate
pretokens) instead of whitespace split, and symbols are the byte
alphabet under GPT-2's bytes_to_unicode map restricted to printable
ASCII (identity) plus space -> U+0120 'G-dot'. Pretokens containing any
byte outside printable-ASCII+space are opaque on both engines (the
cross-engine divergence guard; the fixtures have none), so they are
excluded from training exactly as the apply side treats them. The
pretokenizer regex is the RE2-safe simplification of GPT-2's (no
lookahead branch, no apostrophe contractions - documented divergence):
runs of 2+ spaces become their own pretoken instead of donating one
space to the next word.

Run:  python3 tools/train_bpe.py [sfdir] [n_merges] [char|bytes]
Defaults: /root/testdata/sf0.1, 2000 merges, char.
"""
import sys
import collections
import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_MERGES = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
MODE = sys.argv[3] if len(sys.argv) > 3 else "char"
assert MODE in ("char", "bytes"), MODE
OUT = ("src/main/scala/graft/llmdata/BpeMerges.scala" if MODE == "char"
       else "src/main/scala/graft/llmdata/BpeMergesBytes.scala")
BAND_TARGET = 1.35  # smallest prefix with documents fertility <= this

# RE2-safe GPT-2-shaped pretokenizer (keep in sync with
# graft.functions.BpeBytesUtil.Pretokenizer and the tx30 twin SQL)
PRETOKEN_RE = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"
GDOT = "Ġ"  # GPT-2's byte-unicode image of the space byte


def printable(w: str) -> bool:
    return all(" " <= ch <= "~" for ch in w)


def byte_map(w: str) -> str:
    return w.replace(" ", GDOT)

# every VARCHAR column across the fixture tables - keep in sync with
# graft.llmdata.BpeCorpus.Columns (the Spark trainer's corpus); the
# LlmDataSpec parity test is the effective sync check
COLUMNS = [
    ("customer", "c_name"), ("customer", "c_mktsegment"),
    ("documents", "text"), ("documents", "lang"), ("documents", "source"),
    ("events", "event_type"), ("events", "props"),
    ("lineitem", "l_returnflag"), ("lineitem", "l_linestatus"),
    ("nation", "n_name"), ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("part", "p_name"), ("part", "p_brand"), ("part", "p_type"),
    ("region", "r_name"), ("supplier", "s_name"),
]

con = duckdb.connect()
if MODE == "char":
    union = " UNION ALL ".join(
        f"SELECT unnest(string_split({c}, ' ')) AS w "
        f"FROM read_parquet('{SFDIR}/{t}.parquet') WHERE {c} IS NOT NULL"
        for t, c in COLUMNS)
    rows = con.execute(
        f"SELECT w, count(*) FROM ({union}) WHERE w <> '' GROUP BY w ORDER BY w"
    ).fetchall()
else:
    pat = PRETOKEN_RE.replace("'", "''")
    union = " UNION ALL ".join(
        f"SELECT unnest(regexp_extract_all({c}, '{pat}')) AS w "
        f"FROM read_parquet('{SFDIR}/{t}.parquet') WHERE {c} IS NOT NULL"
        for t, c in COLUMNS)
    raw = con.execute(
        f"SELECT w, count(*) FROM ({union}) GROUP BY w ORDER BY w"
    ).fetchall()
    # opaque (non-printable) pretokens never merge; exclude from training
    rows = [(byte_map(w), c) for w, c in raw if printable(w)]
print(f"corpus: {len(rows)} distinct words")


def train(rows, n_merges):
    """Incremental subword-nmt training over (word, freq) rows.

    Words are CODE-POINT sequences (surrogate-safe; Python str iteration
    is already per code point). Tie-break: max count, then lexicographic
    (code-point order) on (left, right) - identical to the Spark
    trainer's and DuckDB twin's ordering.
    """
    words = [list(w) for w, _ in rows]
    freq = [int(c) for _, c in rows]
    pc = collections.defaultdict(int)   # pair -> weighted count
    occ = collections.defaultdict(set)  # pair -> word indices containing it
    for wi, (w, c) in enumerate(zip(words, freq)):
        for i in range(len(w) - 1):
            p = (w[i], w[i + 1])
            pc[p] += c
            occ[p].add(wi)
    merges = []
    for _ in range(n_merges):
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for wi in list(occ[best]):
            w = words[wi]
            c = freq[wi]
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                pc[p] -= c
                if pc[p] == 0:
                    del pc[p]
            out, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            words[wi] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pc[p] += c
                occ[p].add(wi)
        occ.pop(best, None)
    return merges


merges = train(rows, N_MERGES)
print(f"trained {len(merges)} merges")

# ---- pick the Band prefix: smallest N with documents fertility <= target
if MODE == "char":
    doc_rows = con.execute(
        f"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS w
                       FROM read_parquet('{SFDIR}/documents.parquet')
                       WHERE text IS NOT NULL)
            SELECT w, count(*) FROM w WHERE w <> '' GROUP BY w"""
    ).fetchall()
else:
    pat = PRETOKEN_RE.replace("'", "''")
    doc_rows = [(byte_map(w), c) for w, c in con.execute(
        f"""WITH w AS (SELECT unnest(regexp_extract_all(text, '{pat}')) AS w
                       FROM read_parquet('{SFDIR}/documents.parquet')
                       WHERE text IS NOT NULL)
            SELECT w, count(*) FROM w GROUP BY w"""
    ).fetchall() if printable(w)]


def apply_bpe(word, rank):
    toks = list(word)
    while len(toks) > 1:
        best, bi = None, 1 << 60
        for i in range(len(toks) - 1):
            r = rank.get((toks[i], toks[i + 1]))
            if r is not None and r < bi:
                bi, best = r, (toks[i], toks[i + 1])
        if best is None:
            break
        a, b = best
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def doc_fertility(n):
    rank = {p: i for i, p in enumerate(merges[:n])}
    nt = nw = 0
    for w, c in doc_rows:
        nt += len(apply_bpe(w, rank)) * c
        nw += c
    return nt / nw


band_n = len(merges)
for n in range(1, len(merges) + 1):
    if doc_fertility(n) <= BAND_TARGET:
        band_n = n
        break
band_fert = doc_fertility(band_n)
print(f"band prefix: N={band_n}, documents fertility {band_fert:.3f}")


def esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


pairs_src = ",\n    ".join(f'("{esc(a)}", "{esc(b)}")' for a, b in merges)
obj = "BpeMerges" if MODE == "char" else "BpeMergesBytes"
alias_src = ("""

  /** Back-compat alias: the default table. */
  val Merges: IndexedSeq[(String, String)] = Band"""
             if MODE == "char" else "")
level = ("Character-level" if MODE == "char"
         else "BYTE-level (GPT-2-shaped pretokens, space -> U+0120)")
src = f'''package graft.llmdata

/** GENERATED by tools/train_bpe.py - do not edit by hand.
  *
  * {level} BPE merge table trained on the fixtures' full text
  * surface at {SFDIR} (every VARCHAR column, word-frequency weighted;
  * see the trainer's corpus rationale). {len(merges)} merges; rank =
  * position. Regenerate with:
  *   python3 tools/train_bpe.py {SFDIR} {N_MERGES} {MODE}
  *
  * PREFIX PROPERTY: merges are learned in global frequency order, so
  * `Full.take(n)` is itself the exact n-merge table for this corpus.
  * [[Band]] ({band_n} merges) is the prefix whose fertility over
  * `documents` measures {band_fert:.3f} tokens/word (the published
  * ~1.1-1.6 band; smallest prefix <= {BAND_TARGET}); it is the DEFAULT
  * table for the documents-family operators. Beyond ~N=160 the
  * fixture's closed 31-word prose vocabulary merges completely
  * (fertility exactly 1.0 and packing drift identically 0 - the
  * measured saturation that bounds the default table; documents-only
  * training exhausts outright at 89 merges). [[Full]] is used where a
  * realistic-size table is non-degenerate: the cross-domain audit's
  * entity-name domains.
  */
object {obj} {{
  /** (left, right) merge pairs in training order; rank = index. */
  val Full: IndexedSeq[(String, String)] = IndexedSeq(
    {pairs_src})

  /** Mid-band default-table size (see object scaladoc). */
  val BandN: Int = {band_n}

  /** The default (documents-family) table: the mid-band prefix. */
  val Band: IndexedSeq[(String, String)] = Full.take(BandN){alias_src}
}}
'''
with open(OUT, "w") as f:
    f.write(src)
print(f"wrote {OUT}: {len(merges)} merges (band {band_n})")
for i, (a, b) in enumerate(merges[:5]):
    print(f"  {i}: {a!r} + {b!r}")
