"""Deterministic synthetic data: the tokenized-sequence corpus matching
``BASELINE.json``'s ``input_hint`` schema, and the fixed tokens->price
derivation shared by the Spark engine and the local oracle."""
