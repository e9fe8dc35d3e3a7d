// Shim for the missing hpptools submodule header `zstr.hpp`
// (/root/reference/.gitmodules:4-6): zlib-transparent streams.  Golden-test
// fixtures are plain text, so plain fstreams suffice; strict_fstream
// variants throw on open failure like the originals.
#ifndef __ZSTR_SHIM_HPP
#define __ZSTR_SHIM_HPP

#include <fstream>
#include <stdexcept>
#include <string>

namespace strict_fstream
{

class ifstream : public std::ifstream
{
public:
    ifstream() = default;
    explicit ifstream(const std::string& name) : std::ifstream(name)
    {
        if (not is_open())
        {
            throw std::runtime_error("strict_fstream: failed to open: " + name);
        }
    }
};

class ofstream : public std::ofstream
{
public:
    ofstream() = default;
    explicit ofstream(const std::string& name) : std::ofstream(name)
    {
        if (not is_open())
        {
            throw std::runtime_error("strict_fstream: failed to open: " + name);
        }
    }
};

} // namespace strict_fstream

namespace zstr
{

// plain-text passthrough (fixtures are uncompressed)
class ifstream : public strict_fstream::ifstream
{
public:
    using strict_fstream::ifstream::ifstream;
};

class ofstream : public strict_fstream::ofstream
{
public:
    using strict_fstream::ofstream::ofstream;
};

} // namespace zstr

#endif
