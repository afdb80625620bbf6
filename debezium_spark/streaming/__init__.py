"""The CDC engine: snapshot phase + change-log replay loop."""
