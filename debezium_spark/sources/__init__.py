"""Sources: initial consistent snapshot + change-log tail readers."""
