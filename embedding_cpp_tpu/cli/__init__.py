"""Command-line tools (main, quantize, convert, make_test_model)."""
