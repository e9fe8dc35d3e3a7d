// Shim for the missing tclap submodule (/root/reference/.gitmodules:7-9,
// a fork of tclap).  Reconstructed from call sites: the dev tools
// (run-viterbi.cpp:27-36, run-fwbw.cpp:29-42,
// compute-state-transitions.cpp:16-29) use CmdLine, ValueArg<T>,
// MultiArg<T>, SwitchArg, `.get()`, and the fork's implicit `operator T()`
// conversion; the full driver (nanocall.cpp:50-95,908-915) additionally
// uses the 3-arg CmdLine ctor, UnlabeledMultiArg (positional inputs),
// mutable `.get()` (e.g. `opts::train_drift.get() = "0"`,
// nanocall.cpp:950), SwitchArg::set (nanocall.cpp:1005), and
// getProgramName/getVersion/getOrigArgv.
#ifndef __TCLAP_SHIM_CMDLINE_H
#define __TCLAP_SHIM_CMDLINE_H

#include <cstdlib>
#include <iostream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace TCLAP
{

class Arg_Base;

class CmdLine
{
public:
    explicit CmdLine(const std::string& description,
                     char /*delim*/ = ' ', const std::string& version = "")
        : _description(description), _version(version) {}

    void add(Arg_Base* a) { _args.push_back(a); }
    void set_unlabeled(Arg_Base* a) { _unlabeled = a; }
    void parse(int argc, char* argv[]);

    const std::string& getProgramName() const { return _program_name; }
    const std::string& getVersion() const { return _version; }
    const std::string& getOrigArgv() const { return _orig_argv; }

private:
    std::string _description;
    std::string _version;
    std::string _program_name;
    std::string _orig_argv;
    std::vector< Arg_Base* > _args;
    Arg_Base* _unlabeled = nullptr;
}; // class CmdLine

class Arg_Base
{
public:
    Arg_Base(const std::string& short_name, const std::string& long_name,
             bool required, bool takes_value, CmdLine& cmd)
        : _short_name(short_name), _long_name(long_name),
          _required(required), _takes_value(takes_value), _was_set(false)
    {
        cmd.add(this);
    }
    virtual ~Arg_Base() = default;

    bool matches(const std::string& tok) const
    {
        return (not _long_name.empty() and tok == "--" + _long_name)
            or (not _short_name.empty() and tok == "-" + _short_name);
    }
    bool takes_value() const { return _takes_value; }
    bool required() const { return _required; }
    bool was_set() const { return _was_set; }
    const std::string& long_name() const { return _long_name; }

    virtual void set_from(const std::string& v) = 0;

protected:
    std::string _short_name;
    std::string _long_name;
    bool _required;
    bool _takes_value;
    bool _was_set;
}; // class Arg_Base

template < typename T >
class ValueArg : public Arg_Base
{
public:
    ValueArg(const std::string& short_name, const std::string& long_name,
             const std::string& /*desc*/, bool required, T default_value,
             const std::string& /*type_desc*/, CmdLine& cmd)
        : Arg_Base(short_name, long_name, required, true, cmd),
          _value(default_value) {}

    T& get() { return _value; }  // the fork's get() is mutable (nanocall.cpp:950)
    const T& get() const { return _value; }
    void set(const T& v) { _value = v; _was_set = true; }
    operator T() const { return _value; }

    void set_from(const std::string& v) override
    {
        std::istringstream iss(v);
        iss >> _value;
        _was_set = true;
    }

private:
    T _value;
}; // class ValueArg

template <>
inline void ValueArg< std::string >::set_from(const std::string& v)
{
    _value = v;
    _was_set = true;
}

template < typename T >
class MultiArg : public Arg_Base
{
public:
    typedef typename std::vector< T >::const_iterator const_iterator;

    MultiArg(const std::string& short_name, const std::string& long_name,
             const std::string& /*desc*/, bool required,
             const std::string& /*type_desc*/, CmdLine& cmd)
        : Arg_Base(short_name, long_name, required, true, cmd) {}

    const std::vector< T >& get() const { return _values; }
    const_iterator begin() const { return _values.begin(); }
    const_iterator end() const { return _values.end(); }

    void set_from(const std::string& v) override
    {
        std::istringstream iss(v);
        T x;
        iss >> x;
        _values.push_back(x);
        _was_set = true;
    }

private:
    std::vector< T > _values;
}; // class MultiArg

template <>
inline void MultiArg< std::string >::set_from(const std::string& v)
{
    _values.push_back(v);
    _was_set = true;
}

class SwitchArg : public Arg_Base
{
public:
    SwitchArg(const std::string& short_name, const std::string& long_name,
              const std::string& /*desc*/, CmdLine& cmd, bool default_value = false)
        : Arg_Base(short_name, long_name, false, false, cmd),
          _value(default_value) {}

    bool get() const { return _value; }
    void set(bool v) { _value = v; _was_set = true; }
    operator bool() const { return _value; }

    void set_from(const std::string&) override
    {
        _value = true;
        _was_set = true;
    }

private:
    bool _value;
}; // class SwitchArg

// positional arguments (nanocall.cpp:94: input files)
template < typename T >
class UnlabeledMultiArg : public Arg_Base
{
public:
    typedef typename std::vector< T >::const_iterator const_iterator;

    UnlabeledMultiArg(const std::string& /*name*/, const std::string& /*desc*/,
                      bool required, const std::string& /*type_desc*/,
                      CmdLine& cmd)
        : Arg_Base("", "", required, true, cmd)
    {
        cmd.set_unlabeled(this);
    }

    const std::vector< T >& get() const { return _values; }
    const_iterator begin() const { return _values.begin(); }
    const_iterator end() const { return _values.end(); }

    void set_from(const std::string& v) override
    {
        std::istringstream iss(v);
        T x;
        iss >> x;
        _values.push_back(x);
        _was_set = true;
    }

private:
    std::vector< T > _values;
}; // class UnlabeledMultiArg

template <>
inline void UnlabeledMultiArg< std::string >::set_from(const std::string& v)
{
    _values.push_back(v);
    _was_set = true;
}

inline void CmdLine::parse(int argc, char* argv[])
{
    _program_name = argc > 0 ? argv[0] : "";
    {
        std::ostringstream oss;
        for (int i = 0; i < argc; ++i)
        {
            if (i) oss << ' ';
            oss << argv[i];
        }
        _orig_argv = oss.str();
    }
    for (int i = 1; i < argc; ++i)
    {
        std::string tok(argv[i]);
        if (tok == "--version")
        {
            std::cout << _version << std::endl;
            std::exit(EXIT_SUCCESS);
        }
        if (tok == "--help" or tok == "-h")
        {
            std::cout << _description << std::endl;
            std::exit(EXIT_SUCCESS);
        }
        Arg_Base* hit = nullptr;
        for (auto* a : _args)
        {
            if (a->matches(tok))
            {
                hit = a;
                break;
            }
        }
        if (hit == nullptr)
        {
            // non-option token: positional input (UnlabeledMultiArg)
            if (_unlabeled != nullptr and
                (tok.empty() or tok[0] != '-' or tok == "-"))
            {
                _unlabeled->set_from(tok);
                continue;
            }
            std::cerr << "unknown option: " << tok << std::endl;
            std::exit(EXIT_FAILURE);
        }
        if (hit->takes_value())
        {
            if (i + 1 >= argc)
            {
                std::cerr << "option requires a value: " << tok << std::endl;
                std::exit(EXIT_FAILURE);
            }
            hit->set_from(argv[++i]);
        }
        else
        {
            hit->set_from("");
        }
    }
    for (auto* a : _args)
    {
        if (a->required() and not a->was_set())
        {
            std::cerr << "missing required option: --" << a->long_name()
                      << std::endl;
            std::exit(EXIT_FAILURE);
        }
    }
}

} // namespace TCLAP

#endif
