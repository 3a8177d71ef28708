package graft.types

/** Schema transforms: flattening an almost-flat document schema (possibly
  * with scalar unions) into a table schema with one scalar type per column
  * (reference transform.clj).
  */
object Transform {

  /** Widening lattice: type-rollup[n] is encompassed by type-rollup[n+1]
    * (transform.clj:38). Anything outside the lattice (date, complex)
    * collapses to Str("") — the reference's documented cop-out
    * (transform.clj:43-46).
    */
  val typeRollup: Seq[Kind] =
    Seq(Kind.Null, Kind.Bool, Kind.Int, Kind.Real, Kind.Str)

  def genericizeTypes(t1: SchemaType, t2: SchemaType): SchemaType = {
    val i1 = typeRollup.indexOf(t1.kind)
    val i2 = typeRollup.indexOf(t2.kind)
    if (i1 < 0 || i2 < 0) StrT.of("")
    else if (i1 < i2) t2
    else t1
  }

  def collapseUnion(u: UnionT): SchemaType =
    u.types.reduce(genericizeTypes)

  def scalarify(t: SchemaType): SchemaType = t match {
    case u: UnionT => collapseUnion(u)
    case s if SchemaType.isScalar(s) => s
    case other => throw new IllegalArgumentException(s"not scalar-or-union: $other")
  }

  private def flattenable(t: SchemaType): Boolean = t match {
    case _: DocT | _: CollT => false
    case _                  => true
  }

  private def unionOnlyScalars(u: UnionT): Boolean = u.types.forall(flattenable)

  /** Is this type suitable to define a database table?
    * (transform.clj:25-33): a non-empty document whose properties are all
    * scalars or scalar-only unions.
    */
  def translatableToTableSchema(t: SchemaType): Boolean = t match {
    case d: DocT if !d.isEmptyDoc =>
      d.fields.values.forall(flattenable) &&
        d.fields.values.collect { case u: UnionT => u }.forall(unionOnlyScalars)
    case _ => false
  }

  /** Collapse all union-valued properties via the widening lattice;
    * None if the type is not translatable (transform.clj:64-68).
    */
  def dbTablify(t: SchemaType): Option[DocT] =
    if (!translatableToTableSchema(t)) None
    else {
      val d = t.asInstanceOf[DocT]
      Some(DocT(d.fields.map { case (k, v) => k -> scalarify(v) }))
    }
}
