"""Per-source extraction plugins — the field-mapping logic that turns
raw API/HTML/XML payloads into ``(url, title, description,
full_content, details, …)`` rows, re-expressed Spark-first.

Reference analog: ``plugins/rest_requesters/*`` and
``plugins/scrapers/*`` — each plugin's ``run(documents)`` fetches
payloads over HTTP and maps fields per corpus. Here the HTTP leg is
out of scope (no network in this sandbox; payloads arrive as a
DataFrame column, e.g. from an ingestion table or the api_datasource
partition reader) and the EXTRACTION leg — the part that is actually
corpus-specific logic — is a DataFrame→DataFrame transform:

- JSON sources (HAL, OpenAlex, TED, UVED) parse with ``from_json``
  and explicit schemas, then map fields with pure column expressions
  (JVM-side, whole-stage-codegen'd, scale-free).
- Tree-shaped payloads Catalyst can't walk (PLOS JATS-XML, Wikipedia
  section trees, HTML pages) decode in Arrow-batched pandas UDFs via
  ``mapInPandas`` — stdlib parsers, no per-row Python round-trips.

Error semantics: the reference raises per-document exceptions and
catches them into ``WrapperRetrieveDocument.error_info``; here bad
rows carry a non-null ``error_info`` column and flow to the
dead-letter channel (R6) — same taxonomy, no job-killing throw.
"""
