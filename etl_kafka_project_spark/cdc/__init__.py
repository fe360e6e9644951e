"""CDC pipeline: envelope decode, batch fold (LWW), MERGE apply, streaming."""
