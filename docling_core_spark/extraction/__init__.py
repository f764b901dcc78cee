"""Main-content extraction: HTML page -> span sequence.

The north rule's extraction tier: strip web-page boilerplate (chrome,
navigation, ads, scripts) with DOM heuristics and recover the document's
main content as the engine's span grammar, so extracted pages feed the
same chunking/export pipeline as every other source.

Modules:
* projection  - which span information an HTML page preserves (the
                normalization that defines extraction ground truth)
* render      - deterministic synthetic page source: span sequence ->
                realistic HTML page with boilerplate chrome
* extract     - from-scratch DOM parser + boilerplate heuristics ->
                span sequence (the actual extraction operator)
* spark       - fused mapInArrow Spark surface + registry queries
"""
