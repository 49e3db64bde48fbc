"""dhr_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Re-expresses the capabilities of castorini/dhr (dense hybrid retrieval,
/root/reference) as an idiomatic Spark lexical pipeline:

  transcripts (conv_id, turn_idx, role, text, tool, ts)
    -> stable docids -> tokenize (Arrow UDF) -> term freqs -> BM25 stats
    -> posting-list segments (delta-gap + varint, block maxes)
    -> top-k retrieval (block-max WAND fast path / DataFrame slow path)

Reference semantics preserved (see SURVEY.md for file:line citations):
  * BM25 k1=0.9 b=0.4, Lucene idf convention (output_vector.py:29)
  * top-k rank: score DESC, docid ASC (gip_retrieval.py:123,336-341)
  * two-stage candidates -> exact rescore (gip_retrieval.py:141-153)
"""

__version__ = "0.1.0"

K1 = 0.9
B = 0.4
