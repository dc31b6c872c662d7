// Minimal stand-in for <boost/functional/hash.hpp> - the reference's
// match4pcsBase.cc uses exactly one symbol from boost, boost::hash_value on a
// std::tuple (match4pcsBase.cc:52,71), to back a std::hash<tuple> shim. Boost
// is not installed in this environment; this header provides a compatible
// hash_value (hash-combine over the tuple elements) so the reference TU
// compiles unmodified. C++14-compatible (no fold expressions / std::apply).
#ifndef REF_ORACLE_BOOST_HASH_SHIM_HPP
#define REF_ORACLE_BOOST_HASH_SHIM_HPP

#include <cstddef>
#include <functional>
#include <tuple>
#include <utility>

namespace boost {

inline void hash_combine_value(std::size_t &seed, std::size_t v) {
  seed ^= v + 0x9e3779b9 + (seed << 6) + (seed >> 2);
}

template <typename T>
std::size_t hash_value(const T &t) {
  return std::hash<T>()(t);
}

namespace detail {
template <std::size_t I, typename Tuple>
struct TupleHasher {
  static void accumulate(std::size_t &seed, const Tuple &t) {
    TupleHasher<I - 1, Tuple>::accumulate(seed, t);
    using Elem = typename std::decay<
        typename std::tuple_element<I - 1, Tuple>::type>::type;
    hash_combine_value(seed, std::hash<Elem>()(std::get<I - 1>(t)));
  }
};
template <typename Tuple>
struct TupleHasher<0, Tuple> {
  static void accumulate(std::size_t &, const Tuple &) {}
};
}  // namespace detail

template <typename... Ts>
std::size_t hash_value(const std::tuple<Ts...> &t) {
  std::size_t seed = 0;
  detail::TupleHasher<sizeof...(Ts), std::tuple<Ts...> >::accumulate(seed, t);
  return seed;
}

}  // namespace boost

#endif  // REF_ORACLE_BOOST_HASH_SHIM_HPP
