// Shim for the missing hpptools submodule header `pfor.hpp`
// (/root/reference/.gitmodules:4-6): parallel-for over a serialized item
// source with optional ordered per-chunk output flushing and a periodic
// progress callback (call sites: nanocall.cpp:282-290,611-619,858-866).
//
// The golden-test builds run the pipeline serially (results must be
// deterministic and ordered for FASTA comparison; the reference defaults to
// -t 1 as well), so this implementation processes items on the calling
// thread in source order — which trivially satisfies pfor's ordered-output
// contract.  n_threads is accepted and ignored.
#ifndef __PFOR_SHIM_HPP
#define __PFOR_SHIM_HPP

#include <ctime>

namespace pfor
{

namespace detail
{
inline unsigned elapsed_s(std::time_t t0) { return (unsigned)(std::time(nullptr) - t0); }
}

// pfor<Input>(n_threads, chunk_size, get_item, process_item, progress)
template < typename Input, typename Get, typename Proc, typename Prog >
void pfor(unsigned /*n_threads*/, unsigned /*chunk_size*/,
          Get get_item, Proc process_item, Prog progress_report)
{
    std::time_t t0 = std::time(nullptr);
    unsigned items = 0;
    Input i;
    while (get_item(i))
    {
        process_item(i);
        ++items;
        progress_report(items, detail::elapsed_s(t0));
    }
}

// pfor<Input, Output>(n_threads, chunk_size, get_item, process_item,
//                     output_chunk, progress) — each chunk's Output object
// is flushed in order; serially, one item per chunk preserves exact
// interleaving (the reference flushes whole chunks in chunk order, so any
// serial chunking yields the same concatenation)
template < typename Input, typename Output,
           typename Get, typename Proc, typename Out, typename Prog >
void pfor(unsigned /*n_threads*/, unsigned /*chunk_size*/,
          Get get_item, Proc process_item, Out output_chunk,
          Prog progress_report)
{
    std::time_t t0 = std::time(nullptr);
    unsigned items = 0;
    Input i;
    while (get_item(i))
    {
        Output o;
        process_item(i, o);
        output_chunk(o);
        ++items;
        progress_report(items, detail::elapsed_s(t0));
    }
}

} // namespace pfor

#endif
