// Shim for the missing hpptools submodule header `logger.hpp`
// (/root/reference/.gitmodules:4-6; the submodule directory is empty in the
// snapshot).  Reconstructed from call sites only: the reference uses
// `LOG(level) << ...` and `LOG(facility, level) << ...` stream macros
// (e.g. Viterbi.hpp:56, Forward_Backward.hpp:60, nanocall.cpp:911-912) with
// levels error/warning/info/debug/debug1/debug2, plus
// `logger::Logger::set_default_level` / `set_levels_from_options`.
//
// For golden-test builds logging is irrelevant, so every LOG expands to a
// no-op sink that still type-checks arbitrary `<<` chains.
#ifndef __LOGGER_SHIM_HPP
#define __LOGGER_SHIM_HPP

#include <algorithm>  // the real hpptools headers pull these in
#include <iomanip>    // transitively; State_Transitions.hpp:47 and
#include <list>       // nanocall.cpp:111,198 (std::list without <list>)
#include <set>        // rely on them
#include <iostream>
#include <string>

namespace logger
{

// level constants (nanocall.cpp:911 passes logger::level::info)
namespace level
{
enum level_enum { error, warning, info, debug, debug1, debug2 };
}

struct Null_Stream
{
    template < typename T >
    Null_Stream& operator << (const T&) { return *this; }
    // swallow std::endl and other manipulators
    Null_Stream& operator << (std::ostream& (*)(std::ostream&)) { return *this; }
};

inline Null_Stream& null_stream()
{
    static Null_Stream s;
    return s;
}

struct Logger
{
    static void set_default_level(const std::string&) {}
    static void set_default_level(int) {}
    template < typename Container >
    static void set_levels_from_options(const Container&) {}
    template < typename Container >
    static void set_levels_from_options(const Container&, std::ostream*) {}
};

} // namespace logger

// both LOG(level) and LOG(facility, level) collapse to the null sink
#define LOG(...) logger::null_stream()
#define LOG_EXIT abort()

#endif
