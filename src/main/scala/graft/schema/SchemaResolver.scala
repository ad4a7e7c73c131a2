package graft.schema

import graft.json._
import java.util.IdentityHashMap
import scala.collection.mutable

/** Resolution of `$ref` / `id`-scoped constraint-spec references.
  *
  * Re-implements the semantics of the reference's SchemaResolver
  * (/root/reference/lib/resolver.js): RFC 6901 JSON-Pointer traversal with
  * `~0`/`~1` unescape + percent-decoding (resolver.js:32-62), `id`-scope
  * cache built by a pre-walk with `url.resolve` scoping and duplicate-id
  * rejection (resolver.js:93-122), external schemas each wrapped in a child
  * resolver with its own dereferencing scope (resolver.js:124-146), circular
  * ref-chain detection via a ref stack (resolver.js:225-253), and the
  * `missing$Ref` option substituting `{}` (≡ always-pass) for unresolvable
  * refs (resolver.js:204-210).
  *
  * Driver-side only: all refs are resolved before Catalyst compilation;
  * there is no runtime analog of the reference's cached compiled
  * sub-validators (/root/reference/lib/jsen.js:850-869) because our input
  * row schema is a finite tree, so recursion bottoms out at compile time.
  */
final class SchemaResolver private (
    val rootSchema: JValue,
    external: Option[JObj],
    val missingRef: Boolean,
    baseIdArg: String) {

  def this(rootSchema: JValue, external: Option[JObj] = None,
           missingRef: Boolean = false) =
    this(rootSchema, external, missingRef, "")

  import SchemaResolver._

  private val idCache = mutable.LinkedHashMap.empty[String, (SchemaResolver, JValue)]
  // normalized refs keyed by node identity (resolver.js:74 uses indexOf on
  // object identity; JValue is a case class, so structural equality would
  // conflate distinct occurrences — use reference identity).
  private val refCache = new IdentityHashMap[JValue, String]()
  private val cache = mutable.HashMap.empty[String, JValue]
  private var resolvers = Map.empty[String, SchemaResolver]
  private var resolvedRootSchema: Option[JValue] = None
  private val refStack = mutable.ArrayBuffer.empty[String]

  {
    buildIdCache(rootSchema, baseIdArg)
    val rootBase = Option(refCache.get(rootSchema)).getOrElse(baseIdArg)
    external.foreach { ext =>
      resolvers = ext.fields.map { case (key, schema) =>
        val id = resolveUri(rootBase, key)
        val child = new SchemaResolver(schema, None, missingRef, id)
        cacheId(id, child.rootSchema, child)
        child.idCache.foreach { case (k, v) => idCache(k) = v }
        // the child's node-keyed normalized refs must be visible to THIS
        // resolver too: the compiler walks external nodes through the
        // root resolver, and a bare `$ref: "#"` inside an external schema
        // must normalize in the EXTERNAL's id scope (resolver.js child
        // dereferencing scope, :124-146) — without the merge it would
        // fall back to the raw "#" and resolve to the registering root
        refCache.putAll(child.refCache)
        key -> child
      }.toMap
    }
    // the draft-4 metaschema is an always-present external scope
    // (resolver.js:162-164 + lib/metaschema.json): a self-describing
    // `$ref: "http://json-schema.org/draft-04/schema#"` resolves without
    // the caller registering anything. A user schema that declares the
    // same id wins (the merge is skipped).
    if (!(rootSchema eq MetaSchema.schema) && !idCache.contains(MetaSchema.Uri)) {
      // a FRESH child resolver per parent (not a JVM-wide singleton):
      // resolve() mutates refStack/cache, and a shared instance would race
      // when two driver threads compile validators concurrently. The
      // pre-walk is ~60 nodes — negligible next to regex compilation.
      val meta = new SchemaResolver(MetaSchema.schema, None, missingRef)
      idCache(MetaSchema.Uri) = (meta, meta.rootSchema)
      // the metaschema's internal `#`-scoped refs must normalize inside its
      // own id scope even when this resolver follows them (node-identity
      // keyed, and MetaSchema.schema is a singleton, so the keys are stable)
      refCache.putAll(meta.refCache)
    }
  }

  private def cacheId(id: String, schema: JValue, resolver: SchemaResolver): Unit = {
    if (idCache.contains(id))
      throw new IllegalArgumentException(s"graft: duplicate schema id $id")
    idCache(id) = (resolver, schema)
  }

  private def buildIdCache(schema: JValue, baseId: String): Unit = schema match {
    case obj: JObj =>
      var id = baseId
      obj.str("id").filter(_.nonEmpty) match {
        case Some(rawId) =>
          id = resolveUri(baseId, rawId)
          cacheId(id, obj, this)
        case None =>
          if ((obj eq rootSchema) && baseId.nonEmpty) cacheId(baseId, obj, this)
      }
      obj.str("$ref").foreach { r => refCache.put(obj, resolveUri(id, r)) }
      obj.fields.foreach { case (_, v) => buildIdCache(v, id) }
    case JArr(items) => items.foreach(buildIdCache(_, baseId))
    case _ => ()
  }

  def getNormalizedRef(schema: JValue): Option[String] =
    Option(refCache.get(schema))

  /** Follow a `$ref` chain to its target; non-ref schemas return themselves. */
  def resolve(schema: JValue): JValue = schema match {
    case obj: JObj if obj.has("$ref") =>
      val ref = getNormalizedRef(obj).orElse(obj.str("$ref")).getOrElse(
        throw invalidRef(Json.render(obj("$ref"))))
      cache.get(ref) match {
        case Some(resolved) => resolved
        case None =>
          if (refStack.contains(ref))
            throw new IllegalArgumentException(s"graft: circular schema reference $ref")
          refStack += ref
          val resolved = try resolveRef(ref) finally refStack.dropRightInPlace(1)
          if (obj eq rootSchema) resolvedRootSchema = Some(resolved)
          resolved
      }
    case other => other
  }

  private def resolveRef(ref: String): JValue = {
    var dest: Option[JValue] = None

    idCache.get(ref).foreach { case (resolver, schema) =>
      dest = Some(resolver.resolve(schema))
    }

    val descriptor = refToPath(ref)
    if (dest.isEmpty && descriptor.base.nonEmpty) {
      idCache.get(descriptor.base).orElse(idCache.get(descriptor.base + "#")) match {
        case Some((resolver, schema)) =>
          dest = get(schema, descriptor.path).map(resolver.resolve)
        case None => ()
      }
    }
    val fullPath =
      if (descriptor.base.nonEmpty && !idCache.contains(descriptor.base) &&
          !idCache.contains(descriptor.base + "#"))
        descriptor.base +: descriptor.path
      else descriptor.path

    if (dest.isEmpty) dest = resolvedRootSchema.flatMap(get(_, fullPath))
    if (dest.isEmpty) dest = get(rootSchema, fullPath)
    if (dest.isEmpty && fullPath.nonEmpty) {
      // external resolver addressed by name path (resolver.js:196-202)
      resolvers.get(fullPath.head).filter(_ => fullPath.length == 1).foreach { r =>
        dest = Some(r.resolve(r.rootSchema))
      }
    }

    dest match {
      case Some(d: JObj) =>
        // Follow ref→ref chains to the final target BEFORE caching, so the
        // refStack check catches every pure ref cycle at compile time. The
        // reference caches the intermediate node (resolver.js:212-216),
        // which lets mutual cycles (a→b→a) slip through to an infinitely
        // recursive runtime validator — a bug class we must not reproduce
        // (SURVEY.md §7.4.6); genuinely recursive-but-grounded specs are
        // still accepted because the compiler inlines against the finite
        // row schema and only rejects cycles with no structural progress.
        val resolved = if (d.has("$ref")) resolve(d) else d
        cache(ref) = resolved
        resolved
      case Some(_) | None =>
        if (missingRef) { val d = JObj.empty; cache(ref) = d; d }
        else throw invalidRef(ref)
    }
  }

  private def invalidRef(ref: String) =
    new IllegalArgumentException(s"graft: invalid schema reference $ref")

  /** True if the node or any descendant object carries a `$ref`
    * (resolver.js:256-276 — arrays are NOT traversed there; we traverse
    * them too, which is strictly safer for compile-time inlining). */
  def hasRef(schema: JValue): Boolean = schema match {
    case obj: JObj =>
      obj.has("$ref") || obj.fields.exists { case (_, v) => hasRef(v) }
    case JArr(items) => items.exists(hasRef)
    case _ => false
  }
}

object SchemaResolver {

  final case class RefPath(base: String, path: List[String])

  /** Split a ref into base URI + JSON-Pointer segments (resolver.js:32-62). */
  def refToPath(ref: String): RefPath = {
    val idx = ref.indexOf('#')
    if (idx < 0) return RefPath(ref, Nil)
    val base = ref.substring(0, idx)
    val frag = ref.substring(idx + 1)
    if (frag.isEmpty) return RefPath(base, Nil)
    var segs = frag.split("/", -1).toList.map(unescapePointerSegment)
    if (frag.startsWith("/")) segs = segs.tail
    RefPath(base, segs)
  }

  private def unescapePointerSegment(seg: String): String = {
    val decoded = try java.net.URLDecoder.decode(seg, "UTF-8") catch {
      case _: IllegalArgumentException => seg
    }
    decoded.replace("~1", "/").replace("~0", "~")
  }

  /** JSON-Pointer get over the spec tree; array indices are numeric segments. */
  def get(obj: JValue, path: List[String]): Option[JValue] = path match {
    case Nil => Some(obj)
    case key :: rest =>
      val child = obj match {
        case o: JObj => o.get(key)
        case JArr(items) =>
          key.toIntOption.filter(i => i >= 0 && i < items.length).map(items)
        case _ => None
      }
      child match {
        case Some(c) if rest.isEmpty => Some(c)
        case Some(c: JObj) => get(c, rest)
        case Some(c: JArr) => get(c, rest)
        case _ => None
      }
  }

  /** RFC 3986 relative resolution, approximating node's `url.resolve`. */
  def resolveUri(base: String, ref: String): String = {
    if (base.isEmpty) return ref
    try {
      val b = new java.net.URI(base)
      val resolved =
        if (ref.startsWith("#")) {
          // fragment-only: replace base fragment
          val bare = base.indexOf('#') match {
            case -1 => base
            case i  => base.substring(0, i)
          }
          bare + ref
        } else b.resolve(ref).toString
      resolved
    } catch {
      case _: Exception => ref
    }
  }
}
