"""Annotation + embedding stages with deterministic local fallbacks.

The reference's two external-service stages — LLM column annotation
(Ollama, ``SemanticAnnotation/semantic_annotation.py:116-131``) and
text embedding (OpenAI, ``SemLink/join_discoverer.py:149-168``) — are
the only parts of the system that cannot be a DataFrame expression.
Here they are ``mapInPandas`` stages behind pluggable interfaces, with
deterministic local implementations (hash embedder, rule-based
annotator) so every pipeline is testable without any network or model.
"""
