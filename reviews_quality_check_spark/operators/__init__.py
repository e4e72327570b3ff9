"""Engine operators: each module composes built-in DataFrame ops (and,
where genuinely necessary, Arrow-batched pandas UDFs) into one
reusable, scale-aware operator family."""
