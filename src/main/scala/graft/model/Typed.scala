package graft.model

/** Case classes for the typed Dataset[T] API surface (q414): the
  * compile-time-checked projection of the documents table and its
  * per-source rollup. Field names match the parquet columns so the
  * encoder binds by name.
  */
final case class DocMeta(doc_id: Long, source: String, lang: String,
    n_chars: Long)

final case class SourceStats(source: String, n_docs: Long, n_en: Long,
    max_chars: Long)
