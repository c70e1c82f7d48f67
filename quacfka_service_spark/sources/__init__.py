"""Stream/batch sources: Kafka (prod) and file-based (dev stand-in)."""
