"""Driver-side plans: the chain-crawl round loop, checkpoint/resume, lineage."""
