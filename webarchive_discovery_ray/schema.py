"""Arrow schemas for the engine's tables.

The ``documents`` schema realises BASELINE.json's input_hint:
``doc_id: string`` + ``spans: list<struct<kind, text, media_ref, offset>>``
— the per-row correctness unit (span-sequence equality) — plus the flat
SolrFields-derived metadata vocabulary
(``warc-indexer/src/main/java/uk/bl/wa/solr/SolrFields.java:33-155``).
Multi-valued Solr fields map to ``list<string>`` columns.

Wide text columns use ``large_string``/``large_binary`` to avoid 2 GB offset
overflow in blocks holding 512 KB texts (SURVEY.md §7.4).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

SPANS_TYPE = pa.list_(SPAN_STRUCT)

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("timestamp14", pa.string()),
        ("record_type", pa.string()),
        ("status", pa.int32()),
        ("mime_served", pa.string()),
        ("location", pa.string()),
        ("content_encoding", pa.string()),
        ("transfer_encoding", pa.string()),
        ("payload", pa.large_binary()),
        ("payload_sha1", pa.string()),
        ("source_file", pa.string()),
        ("source_offset", pa.int64()),
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", SPANS_TYPE),
        ("url", pa.string()),
        ("url_norm", pa.string()),
        ("surt", pa.string()),
        ("url_path", pa.string()),
        ("url_type", pa.string()),
        ("resource_name", pa.string()),
        ("content_type_ext", pa.string()),
        ("host", pa.string()),
        ("host_surt", pa.list_(pa.string())),
        ("domain", pa.string()),
        ("public_suffix", pa.string()),
        ("crawl_date", pa.string()),
        ("crawl_year", pa.string()),
        ("wayback_date", pa.string()),
        ("record_type", pa.string()),
        ("status", pa.int32()),
        ("content_type_served", pa.string()),
        ("content_type_tika", pa.string()),
        ("content_type", pa.string()),
        ("content_type_full", pa.string()),
        ("content_type_norm", pa.string()),
        ("solr_type", pa.string()),
        ("content_type_version", pa.string()),
        ("xml_root_ns", pa.string()),
        ("content_ffb", pa.string()),
        ("content_first_bytes", pa.string()),
        ("hash", pa.string()),
        ("hash_mismatch", pa.bool_()),
        ("content_length", pa.int64()),
        ("redirect_to_norm", pa.string()),
        ("title", pa.string()),
        ("first_paragraph", pa.string()),
        ("elements_used", pa.list_(pa.string())),
        ("links", pa.list_(pa.string())),
        ("links_images", pa.list_(pa.string())),
        ("links_hosts", pa.list_(pa.string())),
        ("links_domains", pa.list_(pa.string())),
        ("links_public_suffixes", pa.list_(pa.string())),
        ("links_hosts_surts", pa.list_(pa.string())),
        ("license_url", pa.list_(pa.string())),
        ("pub_date", pa.string()),
        ("content", pa.large_string()),
        ("content_text_length", pa.int32()),
        ("parse_error", pa.string()),
        ("source_file", pa.string()),
        ("source_offset", pa.int64()),
        # free-form plugin-analyser outputs (§2.10 user-extension surface;
        # the analogue of the reference's arbitrary Solr field adds)
        ("plugin_fields", pa.map_(pa.string(), pa.string())),
    ]
)

CAPTURES_SCHEMA = pa.schema(
    [
        ("surt_key", pa.string()),
        ("timestamp14", pa.string()),
        ("url", pa.string()),
        ("mime", pa.string()),
        ("status", pa.int32()),
        ("digest", pa.string()),
        ("length", pa.int64()),
        ("offset", pa.int64()),
        ("filename", pa.string()),
        ("record_type", pa.string()),
    ]
)

LINKS_SCHEMA = pa.schema(
    [
        ("src_surt", pa.string()),
        ("src_url_norm", pa.string()),
        ("dst_url_norm", pa.string()),
        ("dst_surt", pa.string()),
        ("dst_host", pa.string()),
        ("kind", pa.string()),  # link | image
    ]
)
