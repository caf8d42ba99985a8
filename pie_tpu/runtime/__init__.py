"""Native host runtime bindings (C++ page allocator, scheduler support)."""

from pie_tpu.runtime.allocator import PageAllocator, TOKENS_PER_PAGE
