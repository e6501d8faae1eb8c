"""Shared BPE tokenizer fragments (leaf module).

text.py and pipeline_llm.py each import the other mid-module (the
composed curate-v2 / payload-shard oracles are f-strings, so their
ingredients must exist at decoration time); these definitions live
in a leaf module so either import order resolves.
"""

#: Symbol separator for the BPE-apply encoding (U+001F unit separator —
#: never produced by the fixture generator's printable-text columns).
#: Each symbol is wrapped ``\x1f sym \x1f`` and symbols within a word
#: abut (``\x1f\x1f`` boundary), so a merge pattern
#: ``\x1f a \x1f\x1f b \x1f`` can only match a whole adjacent symbol
#: pair, never the tail of a longer symbol; words are joined with a
#: space (whitespace-split tokens cannot contain one) so merges never
#: cross word boundaries.
_BPE_SEP = "\x1f"

#: Number of induced merges applied by ``text_bpe_tokenize``.  Constant
#: by design: the merge table is vocabulary state, not data — real BPE
#: vocabs are 32-64k entries, still a broadcast-trivial constant at any
#: corpus size.
_BPE_N_MERGES = 50


def bpe_apply_ctes(prefix: str = "") -> str:
    """The merge-learn + encode + apply CTE chain with PREFIXED names
    ({prefix}toks … {prefix}ap) — for composition into statements
    whose own chains already use the bare names (the gate SQL defines
    `toks` and `m`; the _pq_kmeans_sql lesson).  prefix='' reproduces
    _BPE_APPLY_CTES byte-for-byte."""
    p_ = prefix
    return f"""{p_}toks AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS tok
        FROM documents
    ),
    {p_}p AS (
        SELECT unnest(list_transform(range(1, length(tok)),
                                     i -> substr(tok, CAST(i AS INTEGER), 2)))
               AS pair
        FROM {p_}toks
        WHERE length(tok) >= 2
    ),
    {p_}merges AS (
        SELECT list(pair ORDER BY n DESC, pair) AS ms
        FROM (SELECT pair, count(*) AS n FROM {p_}p
              GROUP BY pair ORDER BY n DESC, pair LIMIT {_BPE_N_MERGES})
    ),
    {p_}d AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS words
        FROM documents
    ),
    {p_}enc AS (
        SELECT doc_id,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(length(array_to_string(words, '')) AS BIGINT) AS n_chars,
               array_to_string(list_transform(words,
                   w -> regexp_replace(w, '(?s)(.)',
                                       '{_BPE_SEP}\\1{_BPE_SEP}', 'g')),
                   ' ') AS e
        FROM {p_}d
    ),
    {p_}ap AS (
        SELECT doc_id, n_words, n_chars,
               list_reduce(
                   -- coalesce: zero learned merges makes list() NULL,
                   -- which would NULL the whole fold; the engine's
                   -- reduce over an empty merge list returns e as-is
                   list_prepend(e, coalesce((SELECT ms FROM {p_}merges),
                                            CAST([] AS VARCHAR[]))),
                   (acc, m) -> replace(acc,
                       '{_BPE_SEP}' || substr(m, 1, 1)
                           || '{_BPE_SEP}{_BPE_SEP}'
                           || substr(m, 2, 1) || '{_BPE_SEP}',
                       '{_BPE_SEP}' || m || '{_BPE_SEP}')) AS e2
        FROM {p_}enc
    )"""


#: The merge-learn + encode + apply CTE chain (everything up to the
#: per-doc applied string ``e2`` in ``ap``) — factored so the payload
#: shard writer's oracle composes the SAME tokenizer definition.
_BPE_APPLY_CTES = bpe_apply_ctes("")
