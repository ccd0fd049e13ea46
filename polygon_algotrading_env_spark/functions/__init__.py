"""Column-expression function library (JVM-side; no row-at-a-time Python).

- ``text``    — tokenization, quality scoring, language-ID, fingerprints.
- ``vectors`` — dot/norm/cosine over ``array<float>`` embedding columns.
"""
