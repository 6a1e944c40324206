"""Native (C++) components: FFmpeg video decode extension."""
