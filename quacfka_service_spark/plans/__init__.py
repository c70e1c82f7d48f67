"""Physical-plan inspection: the tooling that keeps scale promises honest."""
