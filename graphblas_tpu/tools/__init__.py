"""Host-side CLI tools (plan building, graph generation)."""
