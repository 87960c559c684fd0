"""L6 utilities: flow visualization, logging, checkpointing, torch conversion."""
