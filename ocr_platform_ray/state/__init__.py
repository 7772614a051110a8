"""Shared mutable state — the one place this engine drops below the
Dataset API to raw Ray actors (task contract: "raw tasks/actors only where
the Dataset API genuinely can't express the semantics, e.g. a shared
mutable index")."""
