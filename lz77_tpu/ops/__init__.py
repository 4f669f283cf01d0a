"""Device-side ops: match finding, parsing, token packing, decode."""
