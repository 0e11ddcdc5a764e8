"""Layer S — Spark-native engine: session config, partitioning/skew
handling, the feature-extraction jobs, manifests and checkpoint-resume."""
